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

  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Long, numPartitions: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    def intDiv(a: Column, b: Column): Column = call_function("div", a, b)

    val keyed = docs.select(col(idCol), col(nTokensCol))
      .repartitionByRange(numPartitions, col(idCol))
      .withColumn("_pid", spark_partition_id())
    // phase 1: per-partition totals -> partition starting offsets.
    // The unpartitioned window runs as ONE task over numPartitions rows
    // (thousands at most) — the classic small-frame exception.
    val offsets = keyed.groupBy(col("_pid"))
      .agg(sum(col(nTokensCol)).as("_ptot"))
      .withColumn("_poff", coalesce(
        sum(col("_ptot")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_poff"))
    // phase 2: local running sum on top of the partition offset
    val local = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq("_pid"))
      .withColumn("start_off",
        col("_poff") + coalesce(sum(col(nTokensCol)).over(local), lit(0L)))
      .withColumn("start_bin", intDiv(col("start_off"), lit(capacity)))
      .withColumn("end_bin",
        when(col(nTokensCol) <= 0, intDiv(col("start_off"), lit(capacity)))
          .otherwise(intDiv(col("start_off") + col(nTokensCol) - 1, lit(capacity))))
      .select(col(idCol), col(nTokensCol),
        col("start_off"), col("start_bin"), col("end_bin"))
  }
}
