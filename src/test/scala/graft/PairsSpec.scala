package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Pairs

/** Deterministic negative mining: triplets must be reproducible,
  * partition-count invariant, and collision-free. */
class PairsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = (1L to 100L).toDF("doc_id")
  private val pos = Seq((1L, 2L), (3L, 4L), (10L, 20L), (50L, 51L))
    .toDF("id_a", "id_b")

  private def run(parts: Int) =
    Pairs.contrastiveTriplets(docs, "doc_id", pos,
        shift = 7L, numPartitions = parts)
      .as[(Long, Long, Long)].collect().toSet

  test("triplets are deterministic and partition-count invariant") {
    val t1 = run(1)
    assert(t1 === run(5))
    assert(t1 === run(64))
    assert(t1 === run(5)) // re-execution
  }

  test("every positive pair gets a negative distinct from both sides") {
    val t = run(5)
    assert(t.size === 4) // no collisions at this shift on 100 docs
    t.foreach { case (a, p, n) =>
      assert(n != a && n != p)
      assert(pos.as[(Long, Long)].collect().toSet.contains((a, p)))
    }
  }

  test("malformed pairs frame is rejected") {
    intercept[IllegalArgumentException] {
      Pairs.contrastiveTriplets(docs, "doc_id",
        pos.withColumn("extra", lit(1)), shift = 7L)
    }
  }
}
