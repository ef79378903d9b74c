package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

/** Fixed-point PageRank: hand-replayed integer arithmetic, structural
  * ordering, and determinism. */
class PageRankSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-replayed integer rounds on a 3-node chain with a cycle") {
    // a(1)→b(2), b→c(3), c→a : N=3, every deg=1
    // Scala replay of the EXACT same int64 ops the operator runs
    val n = 3L
    val base = (1000000000000L * 15L / 100L) / n
    var pr = Map(1L -> 1000000000000L / n, 2L -> 1000000000000L / n,
      3L -> 1000000000000L / n)
    val succ = Map(1L -> 2L, 2L -> 3L, 3L -> 1L)
    for (_ <- 1 to 3) {
      val in = succ.toSeq.map { case (u, v) => v -> pr(u) }.toMap // deg=1
      pr = pr.keys.map(k => k -> (base + 85L * in(k) / 100L)).toMap
    }
    assert(ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 3) === pr)
  }

  test("a hub fed by many leaves outranks the leaves; dangling mass just decays") {
    // leaves 1..10 → hub 100; hub is dangling (no out-edges)
    val out = ranks((1L to 10L).map(i => (i, 100L)), iters = 3)
    assert(out(100L) > out(1L) * 5)
    assert((1L to 10L).map(out).toSet.size === 1) // symmetric leaves agree
    // total mass only ever shrinks (truncation + dangling drop)
    assert(out.values.sum <= 1000000000000L)
  }

  test("an empty edge frame yields an empty result, not a division crash") {
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(PageRank.run(empty, "s", "d").collect().isEmpty)
  }

  test("results are identical across reruns and shuffle-partition settings") {
    val edges = (1L to 200L).map(i => (i, i * 31 % 97))
    val a = ranks(edges, iters = 3)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val b = try ranks(edges, iters = 3)
    finally spark.conf.set("spark.sql.shuffle.partitions", old)
    assert(a === b)
  }
}
