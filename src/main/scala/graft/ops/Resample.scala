package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: project each key's irregular event
  * series onto a fixed-step grid with forward fill (the
  * "resample().ffill()" of the dataframe world) — the feature-
  * engineering step that turns event streams into aligned model inputs.
  *
  * Two stages, both distributed: grid generation is one bounds
  * aggregate per key plus a `sequence` explode (output-proportional,
  * no driver loop, no per-key task), and the fill is [[AsOfJoin]]'s
  * union+window plan — ONE hash exchange of grid+events partitioned by
  * key. Nothing here is new machinery; the operator exists to pin the
  * composition (grid × as-of) as a first-class, oracle-checked API. */
object Resample {

  /** Per-key grid from the key's first event (floored to a step
    * boundary) through its last, every `stepSeconds`; each grid point
    * carries the latest event at or before it as `r_<tsCol>` /
    * `r_<valueCol>` columns. Dedup the series per (key, ts) first if
    * multiple same-timestamp events need a rule other than
    * greatest-payload (the [[AsOfJoin]] tie contract). */
  def resampleFill(series: DataFrame, keyCol: String, tsCol: String,
                   valueCols: Seq[String], stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val epoch = unix_timestamp(col(tsCol))
    val bounds = series.groupBy(col(keyCol))
      .agg(min(epoch).as("_lo"), max(epoch).as("_hi"))
    // TRUE floor to the step boundary (lo − pmod(lo, step); pmod is
    // non-negative): `div`-then-multiply truncates toward zero, which
    // for pre-epoch timestamps rounds the grid start UP past `lo` —
    // dropping the leading grid point, or crashing sequence() outright
    // when the whole span is pre-1970
    val grid = bounds.select(col(keyCol),
      explode(sequence(
        col("_lo") - pmod(col("_lo"), lit(stepSeconds)),
        col("_hi"), lit(stepSeconds))).as("_gs"))
      .select(col(keyCol), timestamp_seconds(col("_gs")).as("grid_ts"))
    AsOfJoin.asOf(grid,
      series.select((keyCol +: tsCol +: valueCols).distinct.map(col): _*),
      Seq(keyCol), "grid_ts", tsCol, valueCols)
  }

  /** Linear-interpolation gap fill — [[resampleFill]]'s sibling for
    * continuous signals (sensor readings, balances): each grid point
    * gets `interp_c = prev + (next−prev)·(t−t_prev)/(t_next−t_prev)`
    * from its surrounding observations. `valueCol` must be an exact
    * long (cents/e6-fixed-point): all deltas and the product stay
    * exact int64, and only the final one-line double expression
    * divides — exactly rounded, so an oracle writing the same line
    * hash-matches. Grid points at an observation's own timestamp take
    * the observed value (the interpolation weight is 0); before the
    * first observation → NULL; after the last → hold (forward fill).
    *
    * Duplicate (key, ts) observations are collapsed to the GREATEST
    * value before interpolation — the [[AsOfJoin]] greatest-payload tie
    * contract, enforced here (not just assumed) because the two window
    * passes would otherwise pick prev/next among same-instant
    * duplicates by partition-local sort order, i.e. nondeterministically
    * (ADVICE r6). The collapse is a partial-aggregating groupBy: with
    * few duplicates it's map-side combine + the exchange the window
    * needed anyway.
    *
    * One union of grid + observations hash-partitioned by key, two
    * key-local windows (prev via last-ignore-nulls over the preceding
    * frame, next via first-ignore-nulls over the following) — the
    * [[AsOfJoin]] plan shape, paid twice, never a global sort. */
  def interpolateLinear(series: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, stepSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val epoch = unix_timestamp(col(tsCol))
    val obs = series.select(col(keyCol), epoch.as("_es"),
        col(valueCol).cast("long").as("_vc"))
      .groupBy(col(keyCol), col("_es")).agg(max(col("_vc")).as("_vc"))
      .withColumn("_obs", lit(1))
    val bounds = obs.groupBy(col(keyCol))
      .agg(min(col("_es")).as("_lo"), max(col("_es")).as("_hi"))
    val grid = bounds.select(col(keyCol),
        explode(sequence(col("_lo") - pmod(col("_lo"), lit(stepSeconds)),
          col("_hi"), lit(stepSeconds))).as("_es"))
      .withColumn("_vc", lit(null).cast("long"))
      .withColumn("_obs", lit(0))
    // at equal timestamps the observation sorts BEFORE the grid point
    // (_obs desc), so the preceding-frame window sees it as "prev" and
    // the same-instant grid point lands exactly on the observed value
    val order = Seq(col("_es").asc, col("_obs").desc)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsEs = when(col("_obs") === 1, col("_es"))
    val obsVc = when(col("_obs") === 1, col("_vc"))
    obs.unionByName(grid)
      .withColumn("_pes", last(obsEs, ignoreNulls = true).over(wPrev))
      .withColumn("_pvc", last(obsVc, ignoreNulls = true).over(wPrev))
      .withColumn("_nes", first(obsEs, ignoreNulls = true).over(wNext))
      .withColumn("_nvc", first(obsVc, ignoreNulls = true).over(wNext))
      .filter(col("_obs") === 0)
      .withColumn("interp_c",
        when(col("_pes").isNull, lit(null).cast("long"))
          .when(col("_nes").isNull || col("_nes") === col("_pes"), col("_pvc"))
          .otherwise(floor(col("_pvc").cast("double") +
            ((col("_nvc") - col("_pvc")) * (col("_es") - col("_pes")))
              .cast("double") /
            (col("_nes") - col("_pes")).cast("double")).cast("long")))
      .select(col(keyCol), timestamp_seconds(col("_es")).as("grid_ts"),
        col("interp_c"))
  }
}
