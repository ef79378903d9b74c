package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: lay every document's
  * tokens on one global tape in a deterministic document order, cut the
  * tape into fixed-`capacity` context windows, and report the window
  * span of each document — the standard "concatenate and chunk"
  * formulation (documents may straddle a window boundary; no padding
  * waste, perfectly full windows).
  *
  * The global token offset is a DISTRIBUTED PREFIX SUM, the piece a
  * naive formulation gets wrong at scale (a window over a global ORDER
  * BY collapses the whole table into ONE task). Two phases instead:
  * range-partition by the order key, then (1) per-partition token
  * totals — a tiny numPartitions-row frame whose running sum is one
  * task over numPartitions rows, broadcast back; (2) a within-partition
  * running sum on top of each partition's offset. The only data-sized
  * exchanges are the range partitioning and the pid-window's exchange,
  * which moves each range block wholesale; state per task is one
  * running long.
  *
  * Output offsets depend ONLY on the total order of `idCol` (range
  * boundaries cancel out of the sum), so results are deterministic and
  * engine-portable: the oracle replays them with one global window.
  * Zero-token documents occupy no tape; they report their insertion
  * point with end_bin = start_bin. */
object Packing {

  /** Distributed prefix sum: appends `outCol` = the sum of `value` over
    * all rows STRICTLY before this one in `orderCols` order, without
    * ever collapsing the table into a single-task global window.
    * Range-partition by the order key; (1) per-partition totals form a
    * tiny numPartitions-row frame whose running sum is one task over
    * numPartitions rows (the classic small-frame exception), broadcast
    * back; (2) a within-partition running sum rides on each partition's
    * offset. Results depend only on the total order — range boundaries
    * cancel out of the sum (PackingSpec proves partition-count
    * invariance). `orderCols` must be a total order (include a unique
    * tie-breaker). */
  def withPrefixSum(df: DataFrame, orderCols: Seq[String], value: Column,
                    outCol: String, numPartitions: Int = 64): DataFrame = {
    // The eager localCheckpoint pins ONE sampled range partitioning:
    // `keyed` feeds both the offsets aggregate and the final join, and
    // RangePartitioner draws its boundary sample with an RDD-id-derived
    // seed — two independent executions of the exchange can place
    // boundary-adjacent rows in different partitions, misaligning every
    // offset after the first divergence (caught at sf0.1: exchange
    // reuse usually hides this, but it is not guaranteed).
    val keyed = df.withColumn("_v", value)
      .repartitionByRange(numPartitions, orderCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = keyed.groupBy(col("_pid"))
      .agg(sum(col("_v")).as("_ptot"))
      .withColumn("_poff", coalesce(
        sum(col("_ptot")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_poff"))
    val local = Window.partitionBy(col("_pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol,
        col("_poff") + coalesce(sum(col("_v")).over(local), lit(0L)))
      .drop("_pid", "_v", "_poff")
  }

  /** Global 1-based row_number over `orderCols` — the prefix sum of 1s,
    * so it scales like [[withPrefixSum]] where a bare
    * `row_number().over(Window.orderBy(...))` funnels everything through
    * one task. */
  def withGlobalRank(df: DataFrame, orderCols: Seq[String],
                     outCol: String = "rank",
                     numPartitions: Int = 64): DataFrame =
    withPrefixSum(df, orderCols, lit(1L), outCol, numPartitions)
      .withColumn(outCol, col(outCol) + 1)

  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Long, numPartitions: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    withPrefixSum(docs.select(col(idCol), col(nTokensCol)),
        Seq(idCol), col(nTokensCol), "start_off", numPartitions)
      .withColumn("start_bin", intDiv(col("start_off"), lit(capacity)))
      .withColumn("end_bin",
        when(col(nTokensCol) <= 0, intDiv(col("start_off"), lit(capacity)))
          .otherwise(intDiv(col("start_off") + col(nTokensCol) - 1, lit(capacity))))
      .select(col(idCol), col(nTokensCol),
        col("start_off"), col("start_bin"), col("end_bin"))
  }
}
