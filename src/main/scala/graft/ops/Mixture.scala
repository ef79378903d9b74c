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

  /** Temperature-resampled mixture at α = 1/2 — the multilingual
    * rebalancing of XLM-R-style pretraining (Conneau et al., "Unsupervised
    * Cross-lingual Representation Learning at Scale", ACL 2020: sample
    * groups ∝ n^α with α < 1 so head languages stop drowning the tail):
    * per-group weights w_g = ⌊√n_g⌋ (EXACT integer square root — the
    * float floor is corrected by cross-multiplication, so the weight
    * replays in ANSI SQL), a document budget apportioned to groups by
    * the largest-remainder (Hamilton) method — base shares by integral
    * DIV, the leftover units to the largest remainders, group-name
    * ascending on ties — and a deterministic hash-rate selection inside
    * each group.
    *
    * The apportionment runs on the per-group frame (#groups rows — the
    * small-frame window exception); the data-sized side is ONE
    * broadcast join + codegen'd filter: keep a doc iff
    * `bucket(id) · n_g < alloc_g · 10⁶` — no per-group sort, no
    * global window, reproducible across runs, engines, and cluster
    * sizes. Allocations sum to EXACTLY `budget`; realized counts track
    * allocations at 1/10⁶ rate resolution (the exact-k-per-group
    * contract, when needed, is [[Splits.sampleExactPerGroup]]'s).
    * Envelope: budget ≤ 10¹² and bucket < 10⁶ keep every product under
    * 2⁶³ for groups up to 10¹² docs. */
  def byTemperature(docs: DataFrame, idCol: String, groupCol: String,
                    budget: Long, seed: String = "tm"): DataFrame = {
    require(budget >= 0 && budget <= 1000000000000L,
      s"budget must be in [0, 1e12], got $budget")
    import graft.functions.PortableHash62.{mix62, portableHash62}
    val counts = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val s0 = floor(sqrt(col("n_docs").cast("double"))).cast("long")
    val weighted = counts.withColumn("weight",
      when((s0 + 1L) * (s0 + 1L) <= col("n_docs"), s0 + 1L)
        .when(s0 * s0 > col("n_docs"), s0 - 1L)
        .otherwise(s0))
    val totals = weighted.agg(sum(col("weight")).as("_wtot"))
    val wAll = Window.orderBy(col("rem").desc, col(groupCol).asc)
    val alloc = weighted.crossJoin(broadcast(totals))
      .withColumn("base", graft.ops.intDiv(lit(budget) * col("weight"),
        col("_wtot")))
      .withColumn("rem", (lit(budget) * col("weight")) % col("_wtot"))
      .withColumn("_rk", row_number().over(wAll).cast("long"))
      .withColumn("_tbase", sum(col("base")).over(wAll.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("alloc", col("base") +
        when(col("_rk") <= lit(budget) - col("_tbase"), 1L).otherwise(0L))
      .select(col(groupCol), col("n_docs"), col("weight"), col("alloc"))
    val bucket = pmod(mix62(portableHash62(
      concat(lit(s"$seed:"), col("doc_id").cast("string")))), lit(1000000L))
    docs.select(col(idCol).as("doc_id"), col(groupCol))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(bucket * col("n_docs") < col("alloc") * 1000000L)
      .select(col("doc_id"), col(groupCol), col("n_docs"), col("weight"),
        col("alloc"))
  }
}
