package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregates (materialized-view maintenance):
  * instead of recomputing a corpus-wide aggregate from 100 TB of facts
  * every batch, each batch contributes a PARTIAL STATE — the algebraic
  * (count, sum, min, max) tuple per key — appended as its own partition
  * of a state table; readers merge states, never raw facts.
  *
  * Scale properties: maintenance cost is O(|batch|) — one map-side-
  * combined aggregation of the new partition only; the state table
  * grows by ≤|distinct keys in batch| rows per batch regardless of fact
  * volume; merge-on-read aggregates states (orders of magnitude smaller
  * than facts), and [[compact]] folds aged partials into one base
  * partition so the read cost stays bounded by |keys| + |recent
  * batches| forever. All four state fields are commutative monoids, so
  * merge order (and therefore partition scan order) cannot change the
  * result — the property the oracle pins by comparing against a direct
  * full recompute.
  */
object IncrementalAgg {

  /** Per-key partial state of one batch: (n, sum_c, min_c, max_c,
    * cnt_c) over an exact-integer value column — `n` counts rows,
    * `cnt_c` counts NON-NULL values, the distinction `avg`/`count(v)`
    * rewrites need (avg divides by the non-null count; conflating the
    * two silently shifts every average of a nullable column). One
    * shuffle on the keys, partials combined map-side. */
  def partials(batch: DataFrame, keyCols: Seq[String], value: Column): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(value).as("sum_c"),
        min(value).as("min_c"), max(value).as("max_c"),
        count(value).as("cnt_c"))

  /** Merge any set of partial states back to the exact aggregate over
    * their union — counts/sum add, min/max fold. State written before
    * `cnt_c` existed merges without it (legacy views keep refreshing;
    * they just never answer the avg/count(v) rewrite shapes). */
  def merge(states: DataFrame, keyCols: Seq[String]): DataFrame = {
    val base = Seq(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
      min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
    val aggs =
      if (states.columns.contains("cnt_c")) base :+ sum(col("cnt_c")).as("cnt_c")
      else base
    states.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold the states of `batchCols` values ≤ `cutoff` into one compacted
    * base state labeled `cutoff` (states are states: merging partials
    * yields a partial), leaving newer batches untouched. Returns the
    * replacement state table content. */
  def compact(states: DataFrame, keyCols: Seq[String], batchCol: String,
              cutoff: String): DataFrame = {
    val old = states.filter(col(batchCol) <= cutoff)
    val recent = states.filter(col(batchCol) > cutoff)
    val stateCols = Seq("n", "sum_c", "min_c", "max_c") ++
      (if (states.columns.contains("cnt_c")) Seq("cnt_c") else Seq.empty)
    merge(old, keyCols).withColumn(batchCol, lit(cutoff))
      .unionByName(recent.select(
        (keyCols.map(col) ++ stateCols.map(col) :+ col(batchCol)): _*))
  }
}
