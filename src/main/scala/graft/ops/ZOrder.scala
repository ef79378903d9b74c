package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered table layout — multi-dimensional
  * data skipping for the at-rest store.
  *
  * A table range-partitioned on ONE column prunes scans on that column
  * only; a predicate on a second dimension still reads every file. The
  * Z-curve interleaves the bits of two dimensions so that rows close in
  * (x, y) are close in z; range-partitioning and sorting by z therefore
  * gives every output file a NARROW min/max envelope on BOTH dimensions
  * at once. Parquet keeps per-row-group min/max statistics for data
  * columns, so a pushed-down 2-D range predicate skips the row groups
  * (and with a file-level catalog, the files) whose envelope misses the
  * box — at 100 TB the difference between scanning everything and
  * scanning the few files a (user, time-range) probe touches.
  *
  * Everything is exact integer arithmetic (min-max scale via integral
  * division, bit interleave via shift/mask) — codegen'd end to end,
  * portable bit-for-bit to the DuckDB oracle, and safe under ANSI mode
  * (scaled values fit 2·bits+1 ≤ 63 bits).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** n-column Morton interleave: bit i of dimension j lands at position
    * n·i + j — the 2-D [[zValue]] generalized (dimension order = bit
    * significance order: earlier columns take the lower lanes, exactly
    * as x did). The interleaved width n·bits must stay under 63 so the
    * curve key fits a non-negative long under ANSI mode. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 1, "need at least one dimension")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63], got $n*$bits")
    (for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), n * i + j))
      .reduce(_ bitwiseOR _)
  }

  /** Quantize a long column into [0, 2^bits) buckets with INTEGRAL
    * arithmetic only: (v − min) div w, where the bucket width
    * w = (max − min) div 2^bits + 1. Division-first never overflows
    * (a multiply-then-divide min-max scale would overflow int64 on
    * wide-range columns like epoch micros); double scaling would round
    * differently in the last ulp across engines. A constant column
    * (w = 1, v = min) quantizes to 0; a domain narrower than 2^bits is
    * mapped by identity-of-offset (small domains don't need all bits).
    * The one envelope left: each dimension's span max − min must itself
    * fit in int64 — i.e. don't z-order a column straddling ±2^62. */
  def scale(v: Column, minV: Column, maxV: Column, bits: Int): Column =
    intDiv(v - minV,
      intDiv(maxV - minV, lit(1L << bits)) + lit(1L))

  /** Attach `zx`, `zy` (scaled dims) and `z` (interleaved) to `df`.
    * Global bounds come from one column-pruned agg pass broadcast back
    * in-plan (a 1-row build side — the same shape as Anomaly's kept-
    * cluster broadcast; at scale this is a cheap extra scan of exactly
    * two columns, not a driver collect). `xCol`/`yCol` must be longs. */
  def withZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("_xmin"), max(col(xCol)).as("_xmax"),
      min(col(yCol)).as("_ymin"), max(col(yCol)).as("_ymax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("zx", scale(col(xCol), col("_xmin"), col("_xmax"), bits))
      .withColumn("zy", scale(col(yCol), col("_ymin"), col("_ymax"), bits))
      .withColumn("z", zValue(col("zx"), col("zy"), bits))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
  }

  /** n-column [[withZ]]: attach `z0..z{n-1}` (scaled dims, in `cols`
    * order) and `z` (interleaved). Same one-pass broadcast-bounds
    * shape — the agg row just carries 2n cells instead of 4. Real
    * layout tuning wants more than two dimensions (e.g. user × time ×
    * amount for a fraud store); each extra dimension costs curve
    * resolution (bits ≤ 63/n), the standard Morton trade. */
  /** A MONOTONE int64 image of dimension column `c` for curve keys
    * (r17): the curve only needs ORDER, so any order-preserving map
    * into a long that [[scale]]'s span arithmetic can't overflow on
    * works. Integrals pass through; DOUBLE/FLOAT go through the
    * sortable-bits bijection HALVED (the image spans the whole int64
    * line, and max−min must stay in range — an arithmetic right shift
    * is monotone for signed longs and costs one ulp of quantization
    * the 2^bits bucketing never sees); DATE → epoch days, TIMESTAMP →
    * epoch micros, DECIMAL(p ≤ 18) → the exact unscaled value.
    * Anything else refuses loudly — a silently-mistyped dimension
    * would cluster on garbage. NOTE: for QUANTIZATION the double image
    * is exponent-skewed (a min-max scale over it resolves sign and
    * exponent, not value) — [[dimQuantizer]] buckets doubles in VALUE
    * space instead; this image is the total-order fallback. */
  def curveDim(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(c).cast("long")
      case DoubleType | FloatType =>
        shiftright(graft.functions.DoubleSortableBits(
          col(c).cast("double")), 1)
      case DateType => unix_date(col(c)).cast("long")
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case d: DecimalType if d.precision <= 18 =>
        (col(c) * lit(BigInt(10).pow(d.scale).toLong)).cast("long")
      case other => throw new IllegalArgumentException(
        s"cannot curve-cluster on '$c' (${other.catalogString}) — " +
          "integral, float/double, date/timestamp, or decimal(p<=18) " +
          "dimensions only")
    }
  }

  /** Value-space quantization of a DOUBLE dimension into [0, 2^bits)
    * — curve keys don't cross engines (no oracle recomputes a double
    * curve), so double arithmetic is fine here and clusters linearly
    * in VALUE where the sortable-bits image would cluster by exponent.
    * IEEE edges handled explicitly, ANSI-safe (no NaN/∞ ever reaches
    * the long cast): NaN buckets last (Spark's sort order); a
    * degenerate span — constant column, ±∞ endpoints, NaN pollution
    * of min/max, or a finite span that overflows to ∞ — parks every
    * row in bucket 0 (unclustered on this dim, never wrong). */
  private[ops] def doubleScale(v: Column, minV: Column, maxV: Column,
      bits: Int): Column = {
    val top = lit((1L << bits) - 1L)
    val w = (maxV - minV) / lit((1L << bits).toDouble)
    when(isnull(v), lit(null).cast("long"))
      .when(isnan(v), top)
      .when(isnan(w) || !(w > 0.0) ||
        w === lit(Double.PositiveInfinity), lit(0L))
      .when(v >= maxV, top)
      .when(v <= minV, lit(0L))
      .otherwise(least(top, floor((v - minV) / w).cast("long")))
  }

  /** One curve dimension's (bounds aggregates, bucket expression):
    * doubles/floats quantize in value space via [[doubleScale]],
    * everything else through the exact integral [[scale]] over its
    * [[curveDim]] image. The bucket expression reads the bounds as
    * `_min<i>` / `_max<i>` columns (the broadcast bounds row). */
  private[ops] def dimQuantizer(df: DataFrame, c: String, i: Int,
      bits: Int): (Seq[Column], Column) = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    df.schema(c).dataType match {
      case DoubleType | FloatType =>
        val v = col(c).cast("double")
        (Seq(min(v).as(s"_min$i"), max(v).as(s"_max$i")),
          doubleScale(v, col(s"_min$i"), col(s"_max$i"), bits))
      case _ =>
        val v = curveDim(df, c)
        (Seq(min(v).as(s"_min$i"), max(v).as(s"_max$i")),
          scale(v, col(s"_min$i"), col(s"_max$i"), bits))
    }
  }

  def withZN(df: DataFrame, cols: Seq[String], bits: Int = 10): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"n*bits must fit 63 bits, got ${cols.size}*$bits")
    val qs = cols.zipWithIndex.map { case (c, i) =>
      dimQuantizer(df, c, i, bits) }
    val aggs = qs.flatMap(_._1)
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = qs.zipWithIndex.foldLeft(df.crossJoin(broadcast(bounds))) {
      case (acc, ((_, b), i)) => acc.withColumn(s"z$i", b)
    }
    scaled
      .withColumn("z",
        zValueN(cols.indices.map(i => col(s"z$i")), bits))
      .drop(cols.indices.flatMap(i => Seq(s"_min$i", s"_max$i")): _*)
  }

  /** Rewrite `df` clustered along the Z-curve over (`xCol`, `yCol`):
    * range-partition by z into `numPartitions` output slices and sort
    * within each, so every written file covers one compact z-interval —
    * a tight (x, y) box. One shuffle; write with the caller's sink. */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              bits: Int = 16, numPartitions: Int = 64): DataFrame =
    withZ(df, xCol, yCol, bits)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))

  /** n-column [[cluster]]. */
  def clusterN(df: DataFrame, cols: Seq[String],
               bits: Int = 10, numPartitions: Int = 64): DataFrame =
    withZN(df, cols, bits)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
}
