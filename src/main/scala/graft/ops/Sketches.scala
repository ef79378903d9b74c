package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash62.portableHash62

/** Count-Min sketch — sublinear-memory frequency estimation for
  * streams/corpora whose key cardinality dwarfs memory (token counts,
  * URL hits, feature frequencies). Complements the EXACT heavy-hitter
  * path ([[Profile.heavyHitters]]): Misra-Gries + recount answers "the
  * top k", the sketch answers point frequency queries for ANY key with
  * an ε·N overestimate bound and zero underestimate.
  *
  * Scale design: the sketch is a depth×width grid of counters. Build is
  * one aggregation keyed on (row, bucket) — map-side partial aggregation
  * caps every map partition's shuffle contribution at depth·width cells
  * no matter how many raw rows it scanned, and the merged sketch is
  * depth·width rows total (KBs for 4×1024: broadcastable). Estimation
  * probes depth cells per query key via a broadcast-joinable lookup. The
  * hashes are the codegen'd engine-portable 62-bit fold
  * ([[graft.functions.PortableHash62]]) over a salted key string, so an
  * external engine can replay the sketch — and the oracle does, cell for
  * cell.
  */
object Sketches {

  private def bucketCol(key: Column, row: Int, width: Int): Column =
    portableHash62(concat(lit(s"cm$row:"), key.cast("string"))) % width

  /** Build the sketch: one row per non-empty cell — (row, bucket, cnt).
    * depth independent salted hashes per input row, one shuffle whose
    * payload is bounded by depth·width per map partition. */
  def countMinBuild(df: DataFrame, key: Column, depth: Int = 4,
                    width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")
    val probes = array((0 until depth).map(i =>
      struct(lit(i).as("row"), bucketCol(key, i, width).as("bucket"))): _*)
    df.select(explode(probes).as("p"))
      .groupBy(col("p.row").as("row"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `keys` (one column, distinct or not):
    * est = min over the key's depth cells; never underestimates, over-
    * estimates by at most ε·N with probability 1−δ (ε≈e/width,
    * δ≈e^−depth). Keys absent from the data may still collide into
    * populated cells — a missing cell reads as 0. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
                       depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = array((0 until depth).map(i =>
      struct(lit(i).as("row"), bucketCol(key, i, width).as("bucket"))): _*)
    keys.select(key.as("key"), explode(probes).as("p"))
      .join(sketch, col("p.row") === col("row") &&
        col("p.bucket") === col("bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
