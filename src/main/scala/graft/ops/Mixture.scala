package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture construction: cap each source's contribution to a
  * corpus at a budget (tokens / chars / bytes), taking documents in a
  * caller-declared priority order until the budget is exhausted — the
  * "data mixing" step that turns per-source corpora plus a sampling
  * recipe into one training set. Greedy-by-priority with a strict
  * cutoff: a document is kept iff the source's cumulative cost BEFORE
  * it is under budget (so the crossing document is kept, and every
  * source with a positive budget contributes at least its first
  * document — no empty-source edge).
  *
  * The per-source running total is the scale hazard: the obvious
  * `sum() over (partition by source order by priority)` puts EACH
  * SOURCE's entire corpus into one sort task, and mixtures have few
  * sources by construction (a web source is most of the data). Instead
  * the cumulative rides [[Packing.withPrefixSum]]'s distributed prefix
  * sum over the (source, priority) total order, and each source's
  * strictly-before-it global offset — a #sources-row aggregate — is
  * subtracted back out (the running sum over that tiny frame is the
  * same small-frame exception withPrefixSum itself uses). Every
  * data-sized stage is range-partitioned; no task ever holds a whole
  * source. */
object Mixture {

  /** Select documents per source under `budgets` (fallback
    * `defaultBudget`), priority = ascending `priorityCols` order (make
    * descending priorities explicit with a negated column; append a
    * unique tie-breaker). Output: the id/source/cost columns plus
    * `cum_before` — the source's spent budget before this document —
    * for rows that made the cut. */
  def byBudget(docs: DataFrame, idCol: String, sourceCol: String,
               costCol: String, priorityCols: Seq[String],
               budgets: Map[String, Long], defaultBudget: Long,
               numPartitions: Int = 64): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val spark = docs.sparkSession
    // a negative cost (upstream corruption) would make the cumulative
    // non-monotonic and let every later document sneak back under the
    // budget — fail loudly in-plan instead of overshooting silently
    val guardedCost = {
      val c = col(costCol).cast("long")
      when(c < 0L, raise_error(concat(
        lit(s"Mixture.byBudget: negative $costCol: "), c.cast("string"))))
        .otherwise(c)
    }
    val base = docs.select(
      (Seq(sourceCol) ++ priorityCols ++ Seq(idCol)).distinct.map(col) :+
        guardedCost.as("_cost"): _*)
    val ordered = Packing.withPrefixSum(base,
      Seq(sourceCol) ++ priorityCols ++ Seq(idCol), col("_cost"),
      "_gcum", numPartitions)
    // strictly-before-this-source global total: #sources rows, one
    // window task over the tiny frame, broadcast back
    val srcOffsets = base.groupBy(col(sourceCol))
      .agg(sum(col("_cost")).as("_stot"))
      .withColumn("_soff", coalesce(
        sum(col("_stot")).over(Window.orderBy(col(sourceCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sourceCol), col("_soff"))
    // createDataFrame handles the empty map fine (the tuple type is
    // static), so no special case
    val overrides = spark.createDataFrame(budgets.toSeq)
      .toDF(sourceCol, "_budget_o")
    ordered
      .join(broadcast(srcOffsets), Seq(sourceCol))
      .join(broadcast(overrides), Seq(sourceCol), "left")
      .withColumn("cum_before", col("_gcum") - col("_soff"))
      .filter(col("cum_before") <
        coalesce(col("_budget_o"), lit(defaultBudget)))
      .select(col(idCol), col(sourceCol), col("_cost").as("cost"),
        col("cum_before"))
  }
}
