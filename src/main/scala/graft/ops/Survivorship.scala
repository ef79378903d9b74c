package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship: consolidate a cluster of matching records
  * (the output of record linkage / entity resolution — e.g.
  * [[FuzzyJoin.linkage]] followed by connected components) into ONE
  * record per entity, choosing each field's surviving value by an
  * explicit, deterministic rule. This is the standard MDM
  * ("master data management") consolidation step; the reference's SCD2
  * dimension merge keeps *history*, this keeps the *best current value*
  * across conflicting sources.
  *
  * Every rule is deterministic under ties (ties break toward the
  * SMALLEST candidate value in the field's natural order), so the result
  * is reproducible run-to-run and exactly replayable by a SQL oracle —
  * no "arbitrary element of the group" semantics anywhere.
  *
  * Scale shape: all [[MostFrequent]] rules need a per-(entity, value)
  * count, so each costs one extra aggregation pre-pass; all other rules
  * fold into a SINGLE `groupBy(entity)` aggregation. The per-field
  * pre-aggregations and the final assembly all hash-partition on the
  * entity key, so AQE plans the reassembly joins as co-partitioned
  * shuffle joins (the per-field frames are one row per entity — at most
  * the entity count, far smaller than the input). Nothing here is
  * all-pairs and nothing collects to the driver.
  */
object Survivorship {

  /** Per-field survivorship rule. `field` is the input column whose
    * surviving value the rule picks; nulls never survive unless the
    * entity has NO non-null candidate for the field. */
  sealed trait Rule { def field: String }

  /** Most frequent non-null value wins; ties break toward the smallest
    * value. (The classic "majority vote" rule for attributes where
    * agreement across sources signals correctness — names, categories.) */
  final case class MostFrequent(field: String) extends Rule

  /** Non-null value from the row with the LARGEST `orderField` wins
    * (latest-timestamp recency rule); ties break toward the smallest
    * value. `orderField` must be numeric (cast to bigint internally). */
  final case class Latest(field: String, orderField: String) extends Rule

  /** Non-null value from the row with the SMALLEST `priorityField` wins
    * (trusted-source rule: priority 1 beats priority 2); ties break
    * toward the smallest value. `priorityField` must be numeric. */
  final case class BySourcePriority(field: String, priorityField: String)
    extends Rule

  /** Largest non-null value wins (e.g. running balances, last-seen). */
  final case class MaxValue(field: String) extends Rule

  /** Smallest non-null value wins (e.g. first-seen dates). */
  final case class MinValue(field: String) extends Rule

  /** One golden record per `entityCol` value: columns `(entityCol,
    * n_records, <one column per rule, in rule order>)`. `n_records` is
    * the cluster size (bigint). Input rows where `entityCol` is null are
    * dropped (an unclustered record belongs to no entity). */
  def golden(records: DataFrame, entityCol: String,
             rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one survivorship rule required")
    require(rules.map(_.field).distinct.size == rules.size,
      s"one rule per field, got ${rules.map(_.field)}")
    val recs = records.filter(col(entityCol).isNotNull)

    // min_by over a struct whose FIRST component is the negated
    // preference makes "largest preference, then smallest value" a
    // single deterministic aggregate; null-valued rows are excluded by
    // nulling the ordering struct (min_by ignores null orderings).
    def pick(valueCol: Column, negPref: Column): Column =
      min_by(valueCol,
        when(valueCol.isNotNull, struct(negPref, valueCol)))

    val direct = rules.collect {
      case Latest(f, o) =>
        pick(col(f), -col(o).cast("bigint")).as(f)
      case BySourcePriority(f, p) =>
        pick(col(f), col(p).cast("bigint")).as(f)
      case MaxValue(f) => max(col(f)).as(f)
      case MinValue(f) => min(col(f)).as(f)
    }
    val base = recs.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"), direct: _*)

    // each MostFrequent field: count per (entity, value), then the
    // deterministic argmax — one row per entity, joined back on the
    // entity key (co-partitioned with `base`)
    val withModes = rules.collect { case MostFrequent(f) => f }
      .foldLeft(base) { (acc, f) =>
        val mode = recs.filter(col(f).isNotNull)
          .groupBy(col(entityCol), col(f))
          .agg(count(lit(1)).as("_cnt"))
          .groupBy(col(entityCol))
          .agg(min_by(col(f), struct(-col("_cnt"), col(f))).as(f))
        acc.join(mode, Seq(entityCol), "left")
      }

    withModes.select(col(entityCol) +: col("n_records") +:
      rules.map(r => col(r.field)): _*)
  }
}
