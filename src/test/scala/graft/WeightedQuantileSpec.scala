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
    val wide = Seq(("a", BigDecimal(1), 1L)).toDF("g", "v", "w")
      .withColumn("v", col("v").cast("decimal(38,10)"))
    val e = intercept[IllegalArgumentException](
      WeightedQuantile.weightedMedian(wide, "g", "v", "w"))
    assert(e.getMessage.contains("decimal(p<=18)"), e.getMessage)
  }
}
