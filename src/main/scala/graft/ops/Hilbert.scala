package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve clustered layout — [[ZOrder]]'s sibling with strictly
  * better locality: consecutive curve positions are always GRID
  * NEIGHBORS (manhattan distance 1), where the Morton curve jumps
  * across the plane at every power-of-two boundary. Range-partitioning
  * by Hilbert index therefore gives per-file (x, y) envelopes at least
  * as tight as z-order's and without Morton's worst-case seams — the
  * standard layout upgrade when two-dimensional probes dominate.
  *
  * The index is the classic xy2d bit walk (level by level from the top:
  * quadrant digit + rotation of the frame), expressed as `bits` chained
  * PROJECTIONS over named intermediate columns — never one nested
  * expression, whose tree would double per level and explode codegen
  * the same way an inlined CTE chain explodes a SQL plan. All integer
  * CASE/shift/xor arithmetic: exact, ANSI-safe, and replayed term by
  * term by the DuckDB oracle (x_hilbert).
  */
object Hilbert {

  /** Append `outCol` = Hilbert index of (`xCol`, `yCol`), both already
    * quantized to [0, 2^bits) (see [[ZOrder.scale]]). 2·bits ≤ 62. */
  def withHilbert(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, outCol: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    var cur = df
      .withColumn("_hx", col(xCol).cast("long"))
      .withColumn("_hy", col(yCol).cast("long"))
      .withColumn("_hd", lit(0L))
    var level = bits - 1
    while (level >= 0) {
      val s = 1L << level
      cur = cur
        .withColumn("_rx",
          when(col("_hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_ry",
          when(col("_hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_hd", col("_hd") +
          lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        // frame rotation: on ry=0, reflect (if rx=1) then swap axes
        .withColumn("_x1",
          when(col("_ry") === 0 && col("_rx") === 1, lit(s - 1) - col("_hx"))
            .otherwise(col("_hx")))
        .withColumn("_y1",
          when(col("_ry") === 0 && col("_rx") === 1, lit(s - 1) - col("_hy"))
            .otherwise(col("_hy")))
        .withColumn("_hx", when(col("_ry") === 0, col("_y1")).otherwise(col("_x1")))
        .withColumn("_hy", when(col("_ry") === 0, col("_x1")).otherwise(col("_y1")))
        .drop("_x1", "_y1", "_rx", "_ry")
      level -= 1
    }
    cur.withColumn(outCol, col("_hd")).drop("_hx", "_hy", "_hd")
  }

  /** [[ZOrder.withZ]]'s Hilbert analog: scaled dims `zx`/`zy` plus the
    * Hilbert index `h`, bounds from one broadcast agg pass. */
  def withH(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("_xmin"), max(col(xCol)).as("_xmax"),
      min(col(yCol)).as("_ymin"), max(col(yCol)).as("_ymax"))
    val scaled = df.crossJoin(broadcast(bounds))
      .withColumn("zx", ZOrder.scale(col(xCol), col("_xmin"), col("_xmax"), bits))
      .withColumn("zy", ZOrder.scale(col(yCol), col("_ymin"), col("_ymax"), bits))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
    withHilbert(scaled, "zx", "zy", bits, "h")
  }

  /** Hilbert-clustered rewrite — [[ZOrder.cluster]] with the better
    * curve: range-partition and sort by `h`. */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              bits: Int = 16, numPartitions: Int = 64): DataFrame =
    withH(df, xCol, yCol, bits)
      .repartitionByRange(numPartitions, col("h"))
      .sortWithinPartitions(col("h"))
}
