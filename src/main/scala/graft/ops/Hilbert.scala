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
    // dimensions quantize through [[ZOrder.dimQuantizer]] (r17): the
    // Hilbert curve, like the Z-curve, only needs per-dimension
    // buckets — so double/date/timestamp/decimal dimensions cluster
    // too (doubles in value space, the rest via exact integral scale)
    val (ax, bx) = ZOrder.dimQuantizer(df, xCol, 0, bits)
    val (ay, by) = ZOrder.dimQuantizer(df, yCol, 1, bits)
    val aggs = ax ++ ay
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = df.crossJoin(broadcast(bounds))
      .withColumn("zx", bx)
      .withColumn("zy", by)
      .drop("_min0", "_max0", "_min1", "_max1")
    withHilbert(scaled, "zx", "zy", bits, "h")
  }

  /** Hilbert-clustered rewrite — [[ZOrder.cluster]] with the better
    * curve: range-partition and sort by `h`. */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              bits: Int = 16, numPartitions: Int = 64): DataFrame =
    withH(df, xCol, yCol, bits)
      .repartitionByRange(numPartitions, col("h"))
      .sortWithinPartitions(col("h"))

  /** Append `outCol` = n-dimensional Hilbert index of `cols` (each
    * already quantized to [0, 2^bits); n·bits ≤ 62) — the [[ZOrder
    * .zValueN]] counterpart with true locality, closing the round-6 gap
    * where z-order had the n-D generalization and Hilbert (whose whole
    * reason to exist is the better locality) stopped at 2-D.
    *
    * Algorithm: Skilling's transform (John Skilling, "Programming the
    * Hilbert curve", AIP Conf. Proc. 707, 2004) — the standard compact
    * n-D formulation: walk Q from the top bit plane down, per dimension
    * either inverting the low bits of axis 0 or exchanging low bits
    * with it (undoing the rotation each quadrant applies), then
    * Gray-decode across dimensions; the Hilbert index is the plain
    * Morton interleave of the TRANSFORMED coordinates with dimension 0
    * most significant. Like the 2-D walk above, every step is a small
    * integer CASE/xor/mask PROJECTION over named columns — (bits−1)·n
    * + n + bits flat steps, never one nested expression — so the whole
    * computation stays inside whole-stage codegen and is replayed step
    * by step by the DuckDB oracle (x_hilbert_nd) as a chained CTE.
    * (For n = 2 the curve traversal order differs from [[withHilbert]]
    * by a fixed reflection — both are Hilbert curves; the 2-D path is
    * kept for the x_hilbert oracle's xy2d replay.) */
  def withHilbertN(df: DataFrame, cols: Seq[String], bits: Int,
                   outCol: String = "h"): DataFrame = {
    val n = cols.length
    require(n >= 2, s"need >= 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits must be in [1,62], got $n*$bits")
    def g(i: Int) = col(s"_g$i")
    var cur = df
    cols.zipWithIndex.foreach { case (c, i) =>
      cur = cur.withColumn(s"_g$i", col(c).cast("long"))
    }
    // inverse undo: top bit plane down to Q=2
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        val cond = g(i).bitwiseAND(lit(q)) =!= 0
        if (i == 0) {
          // exchanging axis 0 with itself is a no-op; only the invert
          // branch survives
          cur = cur.withColumn("_g0",
            when(cond, g(0).bitwiseXOR(lit(p))).otherwise(g(0)))
        } else {
          // t from the PRE-update columns, then both updates read _t —
          // the sequential in-place C loop expressed as projections
          cur = cur
            .withColumn("_t", when(cond, lit(0L))
              .otherwise(g(0).bitwiseXOR(g(i)).bitwiseAND(lit(p))))
            .withColumn("_g0", when(cond, g(0).bitwiseXOR(lit(p)))
              .otherwise(g(0).bitwiseXOR(col("_t"))))
            .withColumn(s"_g$i", when(cond, g(i))
              .otherwise(g(i).bitwiseXOR(col("_t"))))
        }
      }
      q >>= 1
    }
    // Gray decode: X[i] ^= X[i-1], sequentially (each step reads the
    // already-updated predecessor)
    for (i <- 1 until n)
      cur = cur.withColumn(s"_g$i", g(i).bitwiseXOR(g(i - 1)))
    // trailing correction: t = xor of (2^k - 1) for every set bit k >= 1
    // of the LAST transformed axis, applied to every axis
    cur = cur.withColumn("_t",
      (1 until bits).map { k =>
        when(g(n - 1).bitwiseAND(lit(1L << k)) =!= 0, lit((1L << k) - 1))
          .otherwise(lit(0L))
      }.reduceOption(_ bitwiseXOR _).getOrElse(lit(0L)))
    for (i <- 0 until n)
      cur = cur.withColumn(s"_g$i", g(i).bitwiseXOR(col("_t")))
    // transposed-form index = Morton interleave, dimension 0 taking the
    // TOP lane of each bit plane (zValueN gives earlier dims the lower
    // lanes, so feed it reversed)
    cur
      .withColumn(outCol,
        ZOrder.zValueN((0 until n).reverse.map(g), bits))
      .drop((0 until n).map(i => s"_g$i") :+ "_t": _*)
  }

  /** [[ZOrder.withZN]]'s Hilbert analog: scaled dims `z0..z{n-1}` plus
    * the Hilbert index `h`, bounds from one broadcast agg pass. */
  def withHN(df: DataFrame, cols: Seq[String], bits: Int = 10): DataFrame = {
    require(cols.size >= 2 && cols.size * bits <= 62,
      s"n*bits must fit 62 bits, got ${cols.size}*$bits")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"_min$i"), max(col(c)).as(s"_max$i"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(bounds))) {
      case (acc, (c, i)) => acc.withColumn(s"z$i",
        ZOrder.scale(col(c), col(s"_min$i"), col(s"_max$i"), bits))
    }
    withHilbertN(scaled, cols.indices.map(i => s"z$i"), bits, "h")
      .drop(cols.indices.flatMap(i => Seq(s"_min$i", s"_max$i")): _*)
  }

  /** n-D Hilbert-clustered rewrite: range-partition and sort by `h`. */
  def clusterN(df: DataFrame, cols: Seq[String], bits: Int = 10,
               numPartitions: Int = 64): DataFrame =
    withHN(df, cols, bits)
      .repartitionByRange(numPartitions, col("h"))
      .sortWithinPartitions(col("h"))
}
