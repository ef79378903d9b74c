package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.WeightedQuantile

/** The bucketed two-phase weighted median must equal the one-window
  * textbook form on any input — including bucket-edge values, single-
  * value groups, and tiny bucket counts that force multi-value
  * buckets. */
class WeightedQuantileSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] = {
    val pv = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pv.withColumn("cw", sum(col("vw")).over(wcum))
      .withColumn("tw", sum(col("vw")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("m"), max(col("tw")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  private def bucketed(df: org.apache.spark.sql.DataFrame, buckets: Int) =
    WeightedQuantile.weightedMedian(df, "g", "v", "w", buckets)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hand cases: even/odd mass, ties, single value, negative values") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),          // odd → 2
      ("b", 10L, 5L), ("b", 20L, 5L),                       // tie → lower (10)
      ("c", 7L, 100L),                                      // single value
      ("d", -5L, 3L), ("d", 0L, 1L), ("d", 5L, 1L))         // negative domain → -5
      .toDF("g", "v", "w")
    val expect = Map("a" -> ((2L, 3L)), "b" -> ((10L, 10L)),
      "c" -> ((7L, 100L)), "d" -> ((-5L, 5L)))
    assert(bucketed(df, 4096) === expect)
    assert(bucketed(df, 2) === expect) // multi-value buckets
    assert(naive(df) === expect)
  }

  test("rational quantiles: p90 crossover, q=0 → min, q=1 → max") {
    val df = Seq(("a", 1L, 9L), ("a", 2L, 80L), ("a", 3L, 10L), ("a", 9L, 1L))
      .toDF("g", "v", "w") // tot=100; cum: 9, 89, 99, 100
    def q(n: Long, d: Long) =
      WeightedQuantile.weightedQuantile(df, "g", "v", "w", n, d)
        .head().getLong(1)
    assert(q(9, 10) === 3L)  // smallest v with 10*cum >= 9*100 → cum 99 at v=3
    assert(q(89, 100) === 2L) // exact boundary: 100*89 >= 89*100 at v=2
    assert(q(0, 1) === 1L)
    assert(q(1, 1) === 9L)
  }

  test("equals the one-window form on random inputs at several bucket counts") {
    val gen = Gen.listOfN(200, for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(-10000L, 10000L)
      w <- Gen.choose(1L, 50L)
    } yield (g, v, w))
    (1 to 4).foreach { i =>
      val rows = gen(Gen.Parameters.default, Seed(700L + i))
        .getOrElse(fail("gen failed"))
      val df = rows.toDF("g", "v", "w")
      val reference = naive(df)
      Seq(2, 7, 64, 4096).foreach { b =>
        assert(bucketed(df, b) === reference, s"iteration $i buckets=$b")
      }
    }
  }

  test("DOUBLE domains (r17): the sortable-bits search equals the one-" +
      "window form on doubles spanning signs and exponents — the " +
      "crossover value round-trips bit-exactly, no interpolation") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 600).map { _ =>
      (s"g${rnd.nextInt(4)}",
        rnd.nextGaussian() * math.pow(10.0, rnd.nextInt(24) - 12),
        (rnd.nextInt(9) + 1).toLong)
    } ++ Seq(("edge", -0.0, 1L), ("edge", 0.0, 1L),
      ("edge", Double.MinValue, 2L), ("edge", Double.MaxValue, 1L))
    val df = rows.toDF("g", "v", "w")
    val pv = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = pv.withColumn("cw", sum(col("vw")).over(wcum))
      .withColumn("tw", sum(col("vw")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("m"), max(col("tw")).as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    Seq(2, 64, 4096).foreach { b =>
      val got = WeightedQuantile.weightedMedian(df, "g", "v", "w", b)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getLong(2)))).toMap
      assert(got === reference, s"buckets=$b")
    }
  }

  test("DECIMAL domains (r18, matching the unweighted family): the " +
      "unscaled-int64 search equals the one-window form, the answer " +
      "keeps the input's decimal type bit-exactly, decimal(38) " +
      "refuses loudly") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 500).map { _ =>
      (s"g${rnd.nextInt(4)}",
        BigDecimal(rnd.nextInt(2000001) - 1000000L, 2), // ±10000.00
        (rnd.nextInt(9) + 1).toLong)
    } ++ Seq(("edge", BigDecimal("-99999999999999.99"), 2L),
      ("edge", BigDecimal("0.00"), 1L),
      ("edge", BigDecimal("99999999999999.99"), 1L))
    val df = rows.toDF("g", "v", "w")
      .withColumn("v", col("v").cast("decimal(16,2)"))
    assert(df.schema("v").dataType ===
      org.apache.spark.sql.types.DecimalType(16, 2))
    val pv = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = pv.withColumn("cw", sum(col("vw")).over(wcum))
      .withColumn("tw", sum(col("vw")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("m"), max(col("tw")).as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    Seq(2, 64, 4096).foreach { b =>
      val out = WeightedQuantile.weightedMedian(df, "g", "v", "w", b)
      assert(out.schema("wmedian_c").dataType ===
        org.apache.spark.sql.types.DecimalType(16, 2),
        "the answer column must keep the input's decimal type")
      val got = out.collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
      assert(got === reference, s"buckets=$b")
    }
    // p90 on decimals takes the same exact crossover
    val p90 = WeightedQuantile.weightedQuantile(df, "g", "v", "w", 9L, 10L)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val refP90 = pv.withColumn("cw", sum(col("vw")).over(wcum))
      .withColumn("tw", sum(col("vw")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 10 >= col("tw") * 9)
      .groupBy(col("g")).agg(min(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(p90 === refP90)
  }

  test("WIDE DECIMAL domains (p > 18, r18 — the two-word hierarchical " +
      "search, closing VERDICT r17 missing #5): equals the one-window " +
      "form BIT-EXACTLY on decimal(38,10) spanning full 38-digit " +
      "magnitudes, low-word-only clusters (the slice phase does real " +
      "work), and negatives — the answer keeps the input type") {
    val rnd = new scala.util.Random(43)
    // values travel as STRINGS (the Scala BigDecimal encoder is fixed
    // at decimal(38,18) and cannot hold 28 integer digits) and cast
    // exactly to the declared decimal(38,10)
    def str(b: BigDecimal): String = b.bigDecimal.toPlainString
    def bigDec(digits: Int): String = {
      val s = (1 to digits).map(_ => rnd.nextInt(10)).mkString
      val sign = if (rnd.nextBoolean()) "-" else ""
      str(BigDecimal(BigInt(sign + s), 10))
    }
    val rows = (0 until 400).map(_ =>
      (s"g${rnd.nextInt(4)}", bigDec(rnd.nextInt(38) + 1),
        (rnd.nextInt(9) + 1).toLong)) ++
      // same 128-bit HIGH word, distinct LOW words: the crossover must
      // resolve INSIDE one hi-slice through the offset re-search
      (0 until 60).map(i => ("lo",
        str(BigDecimal((BigInt(1) << 100) + BigInt(i * 7), 10)),
        (i % 5 + 1).toLong)) ++
      // values straddling a 2^64 boundary of the unscaled integer
      // (adjacent hi words): the hi-phase must order them correctly
      (-3 to 3).map(i => ("hi",
        str(BigDecimal((BigInt(1) << 64) + BigInt(i), 10)), 2L)) ++
      Seq(("edge", str(BigDecimal(BigInt(10).pow(38) - 1, 10)), 1L),
        ("edge", str(BigDecimal(-(BigInt(10).pow(38) - 1), 10)), 2L),
        ("edge", "0", 1L))
    val df = rows.toDF("g", "v", "w")
      .withColumn("v", col("v").cast("decimal(38,10)"))
    assert(df.schema("v").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 10))
    val pv = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def refQ(n: Long, d: Long) = pv
      .withColumn("cw", sum(col("vw")).over(wcum))
      .withColumn("tw", sum(col("vw")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * d >= col("tw") * n)
      .groupBy(col("g")).agg(min(col("v")).as("m"), max(col("tw")).as("t"))
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    Seq(2, 64, 4096).foreach { b =>
      val out = WeightedQuantile.weightedMedian(df, "g", "v", "w", b)
      assert(out.schema("wmedian_c").dataType ===
        org.apache.spark.sql.types.DecimalType(38, 10),
        "the answer column must keep the input's decimal type")
      val got = out.collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
      assert(got === refQ(1L, 2L), s"buckets=$b")
    }
    // p90 takes the same hierarchical crossover
    val p90 = WeightedQuantile.weightedQuantile(df, "g", "v", "w", 9L, 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    assert(p90 === refQ(9L, 10L))
  }

  test("Decimal128Bits is an order-preserving bijection: lexicographic " +
      "(hi, lo) signed order equals BigDecimal order, and recompose " +
      "round-trips bit-exactly across the full decimal(38) range") {
    import graft.functions.Decimal128Bits
    val rnd = new scala.util.Random(47)
    def dec(digits: Int): java.math.BigDecimal = {
      val s = (1 to digits).map(_ => rnd.nextInt(10)).mkString
      val sign = if (rnd.nextBoolean()) "-" else ""
      new java.math.BigDecimal(new java.math.BigInteger(sign + s), 6)
    }
    val vals = (0 until 3000).map(_ => dec(rnd.nextInt(38) + 1)) ++
      (-5 to 5).map(i => new java.math.BigDecimal(
        java.math.BigInteger.ONE.shiftLeft(64)
          .add(java.math.BigInteger.valueOf(i.toLong)), 6)) ++
      Seq(java.math.BigDecimal.ZERO.setScale(6))
    def words(bd: java.math.BigDecimal): (Long, Long) = {
      val d = org.apache.spark.sql.types.Decimal(bd, 38, 6)
      (Decimal128Bits.hiBits(d), Decimal128Bits.loBits(d))
    }
    vals.foreach { bd =>
      val (hi, lo) = words(bd)
      assert(Decimal128Bits.recompose(hi, lo, 6)
        .compareTo(bd) === 0, s"round-trip $bd")
    }
    val sortedByValue = vals.sortWith(_.compareTo(_) < 0)
    val sortedByWords = vals.sortBy(words) // (Long, Long) lexicographic
    assert(sortedByWords.map(_.toString) ===
      sortedByValue.map(_.toString), "word order must equal value order")
  }
}
