package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) — the rows no other row dominates.
  * Maximization dominance: q dominates p iff q.x ≥ p.x, q.y ≥ p.y and
  * q beats p strictly in at least one. Exact duplicates do not
  * dominate each other, so a frontier point's ties all survive.
  *
  * The naive formulation is an all-pairs theta join — O(n²) and
  * unusable at scale. The 2-D frontier has a sweep identity instead: a
  * row survives iff its y equals its x-group's maximum AND beats the
  * maximum y over all strictly-greater x. That is one groupBy(x) plus
  * an EXCLUSIVE prefix max over x descending — computed with the same
  * two-phase range-partitioned pattern as Packing.withPrefixSum (max is
  * associative like sum), so no single-task global window anywhere.
  * SkylineSpec proves the identity against the brute-force all-pairs
  * form and pins partition-count invariance.
  */
object Skyline {

  /** Exclusive prefix max of `value` over `orderCol` DESCENDING:
    * appends `outCol` = max(value) over all rows strictly before this
    * one in descending order (null when none) — two-phase, like
    * [[Packing.withPrefixSum]]. Assumes `orderCol` values are unique
    * (callers pass a grouped frame). */
  private def withPrefixMaxDesc(df: DataFrame, orderCol: String,
                                value: Column, outCol: String,
                                numPartitions: Int): DataFrame = {
    // eager checkpoint pins one sampled range partitioning for both
    // consumers of `keyed` — see Packing.withPrefixSum's note
    val keyed = df.withColumn("_v", value)
      .repartitionByRange(numPartitions, col(orderCol).desc)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = keyed.groupBy(col("_pid"))
      .agg(max(col("_v")).as("_ptot"))
      .withColumn("_poff",
        max(col("_ptot")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_pid"), col("_poff"))
    val local = Window.partitionBy(col("_pid"))
      .orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq("_pid"))
      // greatest skips nulls: null only when BOTH sides are empty —
      // exactly "no strictly-preceding row anywhere"
      .withColumn(outCol, greatest(col("_poff"), max(col("_v")).over(local)))
      .drop("_pid", "_v", "_poff")
  }

  /** The 2-D maximization skyline of `df` over (`xCol`, `yCol`), both
    * numeric. Returns the surviving rows with their original columns.
    * Cost: one groupBy(x) shuffle + the two-phase prefix max over the
    * distinct-x frame + one equi-join back on x. */
  def pareto2D(df: DataFrame, xCol: String, yCol: String,
               numPartitions: Int = 64): DataFrame = {
    val gx = df.groupBy(col(xCol)).agg(max(col(yCol)).as("_gy"))
    val pm = withPrefixMaxDesc(gx, xCol, col("_gy"), "_pm", numPartitions)
    df.join(pm, Seq(xCol))
      .filter(col(yCol) === col("_gy") &&
        (col("_pm").isNull || col(yCol) > col("_pm")))
      .drop("_gy", "_pm")
  }
}
