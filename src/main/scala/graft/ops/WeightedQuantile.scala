package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted median at scale. The textbook formulation — one
  * running-sum window over every distinct value of a group — puts a
  * group's ENTIRE value domain through one task: with a handful of
  * groups and billions of distinct values that single-reducer window is
  * the query. This implementation finds the same exact crossover in two
  * bounded phases:
  *
  *   1. bucket the value domain (≤ `buckets` fixed-width ranges per
  *      group, derived from the group's min/max — a tiny broadcast
  *      aggregate) and run the crossing search over per-bucket weight
  *      sums: the window touches ≤ `buckets` rows per group;
  *   2. re-scan ONLY the crossing bucket's values (≈ domain/`buckets`
  *      of the distinct values), offset by the weight mass before it,
  *      and find the exact value where 2·cum ≥ total.
  *
  * Both windows are bounded regardless of corpus size; the heavy
  * structure — the per-(group, value) pre-aggregation — is a plain
  * map-side-combined shuffle that any exact algorithm needs anyway.
  * Semantics identical to the one-window form (lower weighted median:
  * smallest v with 2·cumw(v) ≥ totw), which the spec pins by equality
  * on random inputs and the oracle pins value-level.
  */
object WeightedQuantile {

  /** (group, wmedian_c, total_w) — exact lower weighted median of
    * `valueCol` (integral) weighted by `weightCol` per `groupCol`. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String, buckets: Int = 4096): DataFrame =
    weightedQuantile(df, groupCol, valueCol, weightCol, 1L, 2L, buckets)
      .withColumnRenamed("wquantile_c", "wmedian_c")

  /** Exact lower weighted quantile at the RATIONAL position
    * `qNum/qDen` (e.g. 1/2 = median, 9/10 = p90): the smallest v with
    * qDen·cumw(v) ≥ qNum·totw — the comparison stays in exact int64,
    * so any engine lands on the same row (a floating q would make the
    * crossover row rounding-dependent). Same bounded two-phase search
    * as the median.
    *
    * Domains (r17/r18, the percentilesCont rule — no caller
    * pre-scaling): integral values answer as-is (long); DOUBLE/FLOAT
    * search through the order-preserving sortable-bits int64 bijection
    * and the crossover inverts EXACTLY (no interpolation here — the
    * answer is one of the input values, returned as the double it
    * was); DECIMAL(p ≤ 18, s) maps to its unscaled int64 (×10^s,
    * exact) and the crossover inverts through BigDecimal at the source
    * scale — bit-exact both directions, the answer column keeps the
    * input's decimal type. Wider decimals exceed the int64 search
    * domain and refuse loudly. */
  def weightedQuantile(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String, qNum: Long, qDen: Long,
                       buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(qNum >= 0 && qDen > 0 && qNum <= qDen, s"bad quantile $qNum/$qDen")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Column
    val (toV, fromOv): (Column => Column, Column => Column) =
      df.schema(valueCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          ((c: Column) => c.cast("long"), (c: Column) => c)
        case DoubleType | FloatType =>
          ((c: Column) => graft.functions.DoubleSortableBits(
             c.cast("double")),
           (c: Column) => graft.functions.SortableBitsDouble(c))
        case d: DecimalType if d.precision <= 18 =>
          // the Quantiles decimal mapping: unscaled int64 is exact
          // (p ≤ 18 digits fit a long) and order-preserving; the
          // inverse runs on |groups| rows only, so a UDF through
          // BigDecimal at the SOURCE scale costs nothing at scale —
          // and unlike percentilesCont there is no interpolation, so
          // the round trip is bit-exact, not double-rounded
          val sc = d.scale
          val pow = BigInt(10).pow(sc).toLong
          val un2dec = org.apache.spark.sql.functions.udf(
            (u: java.lang.Long) =>
              if (u == null) null
              else new java.math.BigDecimal(
                java.math.BigInteger.valueOf(u.longValue), sc))
          ((c: Column) => (c * lit(pow)).cast("long"),
           (c: Column) => un2dec(c).cast(d))
        case other => throw new IllegalArgumentException(
          s"weightedQuantile: unsupported value type " +
            s"${other.catalogString} — integral, float/double, or " +
            "decimal(p<=18) (wider decimals exceed the int64 search " +
            "domain; reduce precision first)")
      }
    // the exact per-(g, v) weights — the unavoidable shuffle. It feeds
    // THREE subtrees (bounds, the bucket histogram, the phase-2 probe);
    // the eager checkpoint materializes the raw-data aggregation once
    // (the Dedup.components convention — measured 3× end-to-end
    // without it).
    val pv = df.select(col(groupCol).as("g"), toV(col(valueCol)).as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
      .localCheckpoint(true)
    // per-group domain bounds and totals: tiny, broadcast back
    val bounds = pv.groupBy(col("g"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        sum(col("vw")).as("tw"))
    // fixed bucket width ≥ 1; bucket id ≤ `buckets`
    // integer `div`, not `/`: double division would round bucket edges
    // for domains past 2^53 and could misplace edge values into a
    // neighbouring bucket, breaking the crossing search's monotonicity.
    // OVERFLOW-PROOF (r17): the bucket arithmetic is the ONE shared
    // copy in [[Quantiles.boundedBucketExprs]] — see there for the
    // per-group full-resolution / halved-span branch rationale.
    val (bwExpr, bktExpr) = Quantiles.boundedBucketExprs(buckets)
    val withB = pv.join(broadcast(bounds), Seq("g"))
      .withColumn("bw", greatest(lit(1L), expr(bwExpr)))
      .withColumn("bkt", expr(bktExpr))
    // phase 1: crossing bucket per group (window over ≤ buckets rows)
    val perBucket = withB.groupBy(col("g"), col("bkt"))
      .agg(sum(col("vw")).as("bw_sum"))
    val wb = Window.partitionBy(col("g")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = perBucket
      .withColumn("cum", sum(col("bw_sum")).over(wb))
      .withColumn("before", col("cum") - col("bw_sum"))
      .join(broadcast(bounds.select(col("g"), col("tw"))), Seq("g"))
    // renamed keys break the shared lineage (cumB → crossing is a
    // self-join Spark would otherwise reject as ambiguous)
    val crossing = cumB.filter(col("cum") * qDen >= col("tw") * qNum)
      .groupBy(col("g"))
      .agg(min(col("bkt")).as("target_bkt"))
      .select(col("g").as("gc"), col("target_bkt"))
    val offset = cumB.join(crossing,
        col("g") === col("gc") && col("bkt") === col("target_bkt"))
      .select(col("g").as("go"), col("target_bkt").as("tb"),
        col("before"), col("tw").as("tw2"))
    // phase 2: exact crossover inside the one crossing bucket
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(offset, col("g") === col("go") && col("bkt") === col("tb"))
      .withColumn("cum_in", sum(col("vw")).over(wv))
      .filter((col("before") + col("cum_in")) * qDen >= col("tw2") * qNum)
      .groupBy(col("g"))
      .agg(min(col("v")).as("_ov"), max(col("tw2")).as("total_w"))
      .select(col("g"), fromOv(col("_ov")).as("wquantile_c"),
        col("total_w"))
  }
}
