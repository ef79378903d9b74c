package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{PageRank, Similarity}

/** Semantics of the round-6 additions: centroid silhouette (separated
  * vs mixed clusters) and personalized PageRank (mass localizes around
  * the seed set). */
class SilhouettePprSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("silhouette: well-separated clusters score near 1, a point on the " +
      "other cluster's centroid scores negative") {
    val embs = Seq(
      (1L, "a", Seq(0.0f, 0.0f)), (2L, "a", Seq(0.1f, 0.0f)),
      (3L, "a", Seq(0.0f, 0.1f)),
      (4L, "b", Seq(5.0f, 5.0f)), (5L, "b", Seq(5.1f, 5.0f)),
      (6L, "b", Seq(5.0f, 5.1f)),
      // labeled "a" but sitting on b's centroid — must score negative
      (7L, "a", Seq(5.03f, 5.03f)))
      .toDF("vec_id", "label", "embedding")
    val s = Similarity.silhouetteE6(embs, "vec_id", "label", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Seq(1L, 2L, 3L).foreach(id =>
      assert(s(id) > 900000L, s"tight cluster point $id scored ${s(id)}"))
    assert(s(7L) < -900000L, s"mislabeled point scored ${s(7L)}")
  }

  test("silhouette: single label yields NULL scores (no other centroid)") {
    val embs = Seq((1L, "a", Seq(0.0f, 1.0f)), (2L, "a", Seq(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val rows = Similarity.silhouetteE6(embs, "vec_id", "label", "embedding")
      .collect()
    assert(rows.length === 2 && rows.forall(_.isNullAt(2)))
  }

  test("personalized PageRank: mass concentrates around seeds; rank sums " +
      "stay bounded by the injected mass") {
    // two disconnected stars: seeds only in the first
    val edges = (Seq((1L, 10L), (2L, 10L), (3L, 10L)) ++
      Seq((4L, 20L), (5L, 20L), (6L, 20L))).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L).toDF("id")
    val pr = PageRank.runPersonalized(edges, "src", "dst", seeds, "id",
      iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the un-seeded component holds exactly zero rank
    Seq(4L, 5L, 6L, 20L).foreach(id => assert(pr(id) === 0L, s"node $id"))
    // the seeded star's hub absorbs inflow; seeds keep their restart mass
    assert(pr(10L) > 0L && Seq(1L, 2L, 3L).forall(pr(_) > 0L))
    assert(pr.values.sum <= 1000000000000L)
  }

  test("personalized PageRank with every node seeded ranks like uniform " +
      "restart up to seed-count scaling") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).toDF("id")
    val ppr = PageRank.runPersonalized(edges, "src", "dst", all, "id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val upr = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a 3-cycle is symmetric: both forms give every node the same rank
    assert(ppr.values.toSet.size === 1 && upr.values.toSet.size === 1)
  }
}
