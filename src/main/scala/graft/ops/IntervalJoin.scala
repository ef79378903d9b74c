package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable interval join: for each left row find right rows with
  * `rightTs ∈ [leftTs, leftTs + window]` on the same key (the J3 shape,
  * reference main.py:456).
  *
  * The direct formulation — equi-join on the key + range residual — is
  * correct but per-key quadratic: a hot key with m rows builds an m×m
  * candidate set before the filter (SURVEY §4 flags this as the first
  * custom-planning candidate at 100 TB). This operator buckets time into
  * `window`-width cells: every RIGHT row lands in exactly one bucket,
  * every LEFT row probes its two covering buckets — join key becomes
  * (key, bucket), fan-out is a fixed 2×, and hot keys spread across the
  * time axis instead of melting one reducer.
  */
object IntervalJoin {

  /** Inner interval join. `left`/`right` must share `key`; output =
    * left columns + right columns, rows where
    * right(rightTs) BETWEEN left(leftTs) AND left(leftTs) + windowSeconds.
    * Column name collisions other than `key` must be resolved by the
    * caller beforehand. */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    def bucket(ts: Column): Column = floor(unix_timestamp(ts) / windowSeconds)

    // left probes its two covering buckets: [b(ts), b(ts)+1] always spans
    // [ts, ts+window] because the bucket width equals the window length
    val l = left.withColumn("_ib", explode(array(bucket(col(leftTs)),
      bucket(col(leftTs)) + 1)))
    val r = right.withColumn("_ib", bucket(col(rightTs)))

    l.join(r, Seq(key, "_ib"))
      .filter(col(rightTs).between(col(leftTs),
        col(leftTs) + expr(s"INTERVAL $windowSeconds SECONDS")))
      .drop("_ib")
  }
}
