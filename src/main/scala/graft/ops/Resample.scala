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
}
