package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skyline

/** The sweep identity against the brute-force all-pairs definition,
  * tie/duplicate semantics, and partition-count invariance. */
class SkylineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet

  test("matches the all-pairs dominance definition on random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val got = Skyline.pareto2D(pts.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got === brute(pts))
  }

  test("exact duplicates on the frontier all survive; dominated ties drop") {
    val pts = Seq((5L, 5L), (5L, 5L), (5L, 4L), (4L, 6L), (4L, 5L), (3L, 7L))
    val got = Skyline.pareto2D(pts.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toSeq
    // (5,5) twice (duplicates don't dominate each other), (4,6), (3,7);
    // (5,4) loses within x=5, (4,5) loses to (5,5)
    assert(got.sorted === Seq((3L, 7L), (4L, 6L), (5L, 5L), (5L, 5L)))
  }

  test("result is invariant to the two-phase partition count") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(1000)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .toDF("x", "y")
    val expected = Skyline.pareto2D(pts, "x", "y", numPartitions = 1)
      .as[(Long, Long)].collect().toSet
    Seq(3, 16, 64).foreach { n =>
      val got = Skyline.pareto2D(pts, "x", "y", numPartitions = n)
        .as[(Long, Long)].collect().toSet
      assert(got === expected, s"numPartitions=$n diverged")
    }
  }

  test("extra payload columns ride through untouched") {
    val pts = Seq((1L, 10L, "a"), (2L, 9L, "b"), (2L, 11L, "c"))
      .toDF("x", "y", "tag")
    val got = Skyline.pareto2D(pts, "x", "y")
      .select("tag").as[String].collect().toSet
    assert(got === Set("c"))
  }
}
