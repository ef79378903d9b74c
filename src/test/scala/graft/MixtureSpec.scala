package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mixture

/** Budget-capped mixture: greedy cutoff semantics, per-source budget
  * overrides, and partition-count invariance of the distributed
  * cumulative. */
class MixtureSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // source a: costs 5,4,3,2,1 in priority (ascending p) order
  // source b: costs 10,10
  private val docs = Seq(
    (1L, "a", 1, 5L), (2L, "a", 2, 4L), (3L, "a", 3, 3L),
    (4L, "a", 4, 2L), (5L, "a", 5, 1L),
    (6L, "b", 1, 10L), (7L, "b", 2, 10L))
    .toDF("id", "src", "p", "cost")

  private def run(budgets: Map[String, Long], default: Long,
                  parts: Int = 64): Map[Long, Long] =
    Mixture.byBudget(docs, "id", "src", "cost", Seq("p"), budgets, default,
      numPartitions = parts)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("greedy cutoff: the crossing document is kept, the next is not") {
    // a @ budget 10: cum_before 0,5,9,12 → keep 1,2,3 (3 crosses), drop 4
    // b @ default 10: keep 6 (crossing), drop 7
    val out = run(Map("a" -> 10L), default = 10L)
    assert(out === Map(1L -> 0L, 2L -> 5L, 3L -> 9L, 6L -> 0L))
  }

  test("per-source overrides and default budgets are independent") {
    val out = run(Map("a" -> 1L), default = 25L)
    // a: only the first doc (cum_before 0 < 1); b: everything (20 ≤ 25)
    assert(out.keySet === Set(1L, 6L, 7L))
    assert(out(7L) === 10L)
  }

  test("zero budget excludes a source entirely") {
    val out = run(Map("b" -> 0L), default = 100L)
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("no whole-source sort task: the only Window over the source key is the tiny offsets frame") {
    val plan = graft.ops.Mixture.byBudget(docs, "id", "src", "cost", Seq("p"),
      Map.empty, defaultBudget = 10L).queryExecution.executedPlan.toString
    // the data-sized cumulative must ride the two-phase prefix sum, and
    // the per-source offsets must come back as a broadcast of the tiny
    // aggregate — not a corpus-wide partition-by-source window. Since
    // the partition-consistency fix, the range exchange happens INSIDE
    // the prefix sum's pinned checkpoint (the plan reads it back as an
    // ExistingRDD scan), so the visible plan shows the checkpoint scan
    // + the pid-local window + the broadcast — and no data-sized
    // Window partitioned by the source column anywhere.
    assert(plan.contains("ExistingRDD"), plan)
    assert(plan.contains("windowspecdefinition(_pid"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // a corpus-wide per-source window would show src as the window
    // PARTITION spec: windowspecdefinition(src#N, <order>...)
    assert(!"windowspecdefinition\\(src#\\d+,".r.findFirstIn(plan).isDefined, plan)
  }

  test("cumulative is invariant to the prefix-sum partition count") {
    val one = run(Map.empty, default = 8L, parts = 1)
    val many = run(Map.empty, default = 8L, parts = 7)
    assert(one === many)
    assert(one === Map(1L -> 0L, 2L -> 5L, 6L -> 0L))
  }

  // ----------------------------------------------------- byTemperature

  test("temperature mix: exact isqrt weights, Hamilton allocations sum to budget") {
    // groups: 100, 50, 10, 2 docs → isqrt weights 10, 7, 3, 1 (W = 21)
    // budget 40: raw shares 400/21=19.05, 280/21=13.33, 120/21=5.71, 40/21=1.90
    // bases 19,13,5,1 (=38); remainders 1,7,15,19 → 2 extras to d(19), c(15)
    val docs = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(2)("d"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "grp")
    val alloc = Mixture.byTemperature(docs, "id", "grp", budget = 40L)
      .select("grp", "n_docs", "weight", "alloc").distinct()
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(alloc("a") === ((100L, 10L, 19L)))
    assert(alloc("b") === ((50L, 7L, 13L)))
    assert(alloc("c") === ((10L, 3L, 6L)))
    assert(alloc("d") === ((2L, 1L, 2L)))
    assert(alloc.values.map(_._3).sum === 40L)
  }

  test("temperature mix: selection is deterministic and keeps all when alloc >= n") {
    val docs = (Seq.fill(64)("big") ++ Seq.fill(3)("tiny"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "grp")
    // weights 8 and 1; budget 30 → shares 240/9=26.67, 30/9=3.33 →
    // bases 26,3; rem 6,3 → extra to big → alloc 27, 3. tiny: 3 >= 3 docs
    def kept = Mixture.byTemperature(docs, "id", "grp", budget = 30L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k1 = kept
    assert(k1 === kept, "hash-rate selection must be reproducible")
    val tiny = docs.filter($"grp" === "tiny").collect()
      .map(r => (r.getLong(0), "tiny")).toSet
    assert(tiny.subsetOf(k1), "alloc >= n must keep the whole group")
  }
}
