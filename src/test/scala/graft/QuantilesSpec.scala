package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** The bounded two-phase exact percentile (r16 verdict next #7): the
  * bucketed search must agree BIT-FOR-BIT with Spark's single-reducer
  * `percentile()` on every input shape — that equality is what lets
  * the scale path replace the stock aggregate with oracle hashes
  * unchanged. */
class QuantilesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val QS = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L))

  private def stock(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))

  private def check(rows: Seq[(String, Long)], buckets: Int = 16): Unit = {
    val df = rows.toDF("g", "v")
    val fast = Quantiles.percentilesCont(df, "g", "v", QS,
      buckets = buckets, smallThreshold = 0L) // force the bucketed path
      .orderBy("g").collect().toSeq
    val ref = stock(df).orderBy("g").collect().toSeq
    assert(fast.map(_.toSeq) === ref.map(_.toSeq))
  }

  test("bucketed percentiles equal the stock aggregate bit-for-bit " +
      "on random multisets (duplicates, negatives, skew, tiny groups)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val g = s"g${rnd.nextInt(7)}"
      val v = rnd.nextInt(2000) - 1000 + (if (rnd.nextBoolean()) 0 else i % 13)
      (g, v.toLong)
    } ++ Seq(("lone", 99L)) ++ (0 until 3).map(i => ("tiny", i.toLong))
    check(rows)
    check(rows, buckets = 2)      // degenerate bucketing still exact
    check(rows, buckets = 100000) // more buckets than values
  }

  test("wide domains and heavy duplication stay exact") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { _ =>
      ("w", (rnd.nextLong() % 1000000000000L))
    } ++ (0 until 500).map(_ => ("dup", 5L)) ++
      Seq(("dup", 6L), ("dup", 7L))
    check(rows)
  }

  test("NULL values are ignored and an all-NULL group still answers " +
      "(null percentiles) — exactly the stock aggregate's semantics") {
    val rows: Seq[(String, java.lang.Long)] =
      Seq(("a", 1L: java.lang.Long), ("a", null), ("a", 3L: java.lang.Long),
        ("b", null), ("b", null))
    val df = rows.toDF("g", "v")
    val fast = Quantiles.percentilesCont(df, "g", "v", QS,
      smallThreshold = 0L).orderBy("g").collect().toSeq
    val ref = stock(df).orderBy("g").collect().toSeq
    assert(fast.map(_.toSeq) === ref.map(_.toSeq))
    assert(fast.size === 2, "the all-NULL group must still answer")
    assert(fast(1).isNullAt(1), "all-NULL group ⇒ null percentile")
  }

  private def checkDf(df: org.apache.spark.sql.DataFrame,
      buckets: Int = 16): Unit = {
    val fast = Quantiles.percentilesCont(df, "g", "v", QS,
      buckets = buckets, smallThreshold = 0L)
      .orderBy("g").collect().toSeq
    val ref = stock(df).orderBy("g").collect().toSeq
    assert(fast.map(_.toSeq) === ref.map(_.toSeq))
  }

  test("DOUBLE domains run the bounded search through the sortable-" +
      "bits bijection, bit-identical to the stock aggregate — " +
      "negatives and positives spanning the full int64 image (the " +
      "overflow-proof halved bucketing), subnormals, infinities (r17)") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 4000).map { _ =>
      val mag = math.pow(10.0, rnd.nextInt(40) - 20)
      (s"g${rnd.nextInt(5)}", rnd.nextGaussian() * mag)
    } ++ Seq(
      ("edge", Double.MinValue), ("edge", Double.MaxValue),
      ("edge", -0.0), ("edge", 0.0), ("edge", java.lang.Double.MIN_VALUE),
      ("edge", -java.lang.Double.MIN_VALUE), ("edge", 1.5), ("edge", -2.5),
      ("inf", Double.NegativeInfinity), ("inf", -1.0), ("inf", 1.0),
      ("inf", Double.PositiveInfinity))
    val df = rows.toDF("g", "v")
    checkDf(df)
    checkDf(df, buckets = 2)      // degenerate bucketing still exact
    checkDf(df, buckets = 100000) // more buckets than values
  }

  test("FLOAT domains answer exactly the stock aggregate (per-value " +
      "float→double, then the double machinery)") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 1500).map(_ =>
      (s"g${rnd.nextInt(4)}", (rnd.nextFloat() - 0.5f) * 1e6f))
    checkDf(rows.toDF("g", "v"))
  }

  test("DECIMAL domains map through the exact unscaled int64 and " +
      "invert with percentile()'s own decimal→double rounding") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 2000).map { _ =>
      (s"g${rnd.nextInt(4)}",
        BigDecimal(rnd.nextLong() % 1000000000000L, 3))
    }
    val df = rows.toDF("g", "v")
      .withColumn("v", col("v").cast("decimal(16,3)"))
    checkDf(df)
  }

  test("WIDE DECIMAL domains (p > 18, r18 — closing the last domain " +
      "refusal): the double route is bit-identical to the stock " +
      "aggregate because monotone rounding commutes with order " +
      "statistics — full 38-digit magnitudes, dense low-word-only " +
      "differences, and negatives") {
    val rnd = new scala.util.Random(41)
    // values travel as STRINGS (the Scala BigDecimal encoder is fixed
    // at decimal(38,18) and cannot hold 28 integer digits) and cast
    // exactly to the declared decimal(38,10)
    def bigDec(digits: Int): String = {
      val s = (1 to digits).map(_ => rnd.nextInt(10)).mkString
      val sign = if (rnd.nextBoolean()) "-" else ""
      BigDecimal(BigInt(sign + s), 10).bigDecimal.toPlainString
    }
    val rows = (0 until 2000).map(_ =>
      (s"g${rnd.nextInt(4)}", bigDec(rnd.nextInt(38) + 1))) ++
      // a cluster whose members differ ONLY in the unscaled low word
      // (same 128-bit high word) — distinct decimals that also round
      // to DISTINCT doubles, so ranks inside one hi-slice matter
      (0 until 50).map(i => ("lo",
        BigDecimal((BigInt(1) << 100) + (BigInt(i) << 40), 10)
          .bigDecimal.toPlainString)) ++
      Seq(("edge", BigDecimal(BigInt(10).pow(38) - 1, 10)
          .bigDecimal.toPlainString),
        ("edge", BigDecimal(-(BigInt(10).pow(38) - 1), 10)
          .bigDecimal.toPlainString),
        ("edge", "0"))
    val df = rows.toDF("g", "v")
      .withColumn("v", col("v").cast("decimal(38,10)"))
    assert(df.schema("v").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 10))
    checkDf(df)
    checkDf(df, buckets = 2)
  }

  test("the adaptive small route answers identically") {
    val rows = (0 until 100).map(i => (s"g${i % 3}", i.toLong))
    val df = rows.toDF("g", "v")
    val small = Quantiles.percentilesCont(df, "g", "v", QS,
      smallThreshold = 1L << 20)
    val big = Quantiles.percentilesCont(df, "g", "v", QS,
      smallThreshold = 0L)
    assert(small.orderBy("g").collect().toSeq.map(_.toSeq) ===
      big.orderBy("g").collect().toSeq.map(_.toSeq))
    assert(small.columns.toSeq === Seq("g", "p25", "p50", "p75"))
  }
}
