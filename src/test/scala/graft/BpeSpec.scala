package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Greedy merge semantics and the round loop: overlap resolution,
  * determinism of the argmax, multi-round interaction. */
class BpeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def merge(toks: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(toks)).toDF("toks")
      .select(Bpe.mergeOnce(col("toks"), a, b).as("m"))
      .head().getSeq[String](0)

  test("mergeOnce: greedy left-to-right, overlaps leftmost-first") {
    assert(merge(Seq("a", "b", "c"), "a", "b") === Seq("a_b", "c"))
    assert(merge(Seq("a", "a", "b"), "a", "b") === Seq("a", "a_b"))
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("a_a", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("a_a", "a_a"))
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") === Seq("a_b", "a_b"))
    assert(merge(Seq("x"), "a", "b") === Seq("x"))
    assert(merge(Seq(), "a", "b") === Seq())
  }

  test("train: rounds pick the deterministic argmax and compound") {
    // "w x" dominates round 1; after fusing, "w_x y" dominates round 2
    val docs = Seq(
      (1L, Seq("w", "x", "y", "w", "x", "y")),
      (2L, Seq("w", "x", "z")),
      (3L, Seq("q", "q")))
      .toDF("doc_id", "toks")
    val (out, merges) = Bpe.train(docs, "doc_id", rounds = 2)
    assert(merges.map(m => (m._1, m._2, m._3)) ===
      Seq((1, "w", "x"), (2, "w_x", "y")))
    assert(merges.head._4 === 3L) // "w x" appeared three times
    val rows = out.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) === Seq("w_x_y", "w_x_y"))
    assert(rows(2L) === Seq("w_x", "z"))
    assert(rows(3L) === Seq("q", "q"))
  }
}
