package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (backward) join: attach to every left row the LATEST
  * right row with `rightTs <= leftTs` for the same key — the time-series
  * point-in-time lookup (pandas `merge_asof`, DuckDB `ASOF JOIN`,
  * kdb `aj`). The SCD2 variant (`Scd2.asOf`) covers slowly-changing
  * dims, where validity intervals are explicit; this operator covers the
  * general event-vs-event case where only the right-side timestamps
  * exist.
  *
  * Spark-first plan: NOT a per-left-row subquery (a correlated
  * range-join explodes into O(left × right-per-key) under Catalyst and
  * shuffles twice), but the union trick — tag both sides, ONE shuffle
  * partitioned by key, one window pass ordered by (ts, tag) carrying the
  * latest right payload forward via `last(ignoreNulls)`, then keep the
  * left rows. Cost: a single hash exchange + sort of |L|+|R| rows, the
  * same partitioning a plain equi-join on the key would need, and the
  * payload rides as ONE struct column so the window state is a pointer
  * swap, not per-column state.
  *
  * Ties: a right row AT the left row's timestamp matches (`<=`, tag
  * orders right before left). Several right rows sharing (key, ts) are
  * resolved deterministically to the field-wise GREATEST payload struct
  * (the window order's last element); pre-dedup the right side when a
  * different rule is needed.
  *
  * `tolerance`: with `Some(seconds)`, matches older than `leftTs -
  * tolerance` are nulled out — the row survives, unmatched (pandas
  * merge_asof semantics). Applied AFTER the window pass, so it adds no
  * shuffle. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("_r") && !left.columns.contains("_tag"),
      "left side may not carry reserved columns _r/_tag")
    val payload = (rightTs +: rightPayload).distinct

    val rStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(rStruct))
    val taggedRight = right
      .select((keys ++ payload).distinct.map(col): _*)
      .withColumn("_ts", col(rightTs))
      .withColumn("_tag", lit(0))
      .withColumn("_r", struct(payload.map(col): _*))
      .select((keys.map(col) ++ Seq(col("_ts"), col("_tag"), col("_r"))): _*)

    val unioned = taggedLeft
      .select((keys.map(col) ++ Seq(col("_ts"), col("_tag"), col("_r")) ++
        leftCols.filterNot(keys.contains).map(col)): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    // (ts, tag, _r): right rows sort before the left row at equal ts so
    // `<=` matches; equal-ts right duplicates resolve to the greatest
    // struct — a total, deterministic order.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val withTolerance = tolerance match {
      case Some(sec) => matched.withColumn("_m",
        when(unix_timestamp(col("_ts")) -
          unix_timestamp(col("_m").getField(rightTs)) <= sec, col("_m")))
      case None => matched
    }
    val outRight = payload.map(c =>
      withTolerance("_m").getField(c).as(s"r_$c"))
    withTolerance.select(leftCols.map(col) ++ outRight: _*)
  }
}
