package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Triangles

/** Triangle counting: orientation correctness (each triangle once, all
  * three corners credited) and the co-occurrence edge builder. */
class TrianglesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("K4: four triangles, every vertex in three") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = Triangles.perVertexCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star plus one closing edge: only the closed wedge is a triangle") {
    // hub 1 connected to 2,3,4,5; the single closing edge (2,3) makes
    // exactly one triangle — the hub's other wedges stay open
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
      .toDF("a", "b")
    val out = Triangles.perVertexCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("path graph has no triangles") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Triangles.perVertexCounts(edges).count() === 0L)
  }

  test("wedge and closing joins are equi-joins — no nested-loop fallback") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val plan = Triangles.perVertexCounts(edges)
      .queryExecution.executedPlan.toString
    // the inequality (dst < dst) must ride an equi-join on src as a
    // post-condition, never degrade the join itself to a nested loop
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-equi join in:\n$plan")
  }

  test("cooccurrenceEdges: distinct-membership pairs, weight = shared groups") {
    val df = Seq(
      ("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 2L), // duplicate membership
      ("g2", 1L), ("g2", 2L))
      .toDF("g", "item")
    val all = Triangles.cooccurrenceEdges(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    val strong = Triangles.cooccurrenceEdges(df, "g", "item", minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong === Set((1L, 2L)))
  }
}
