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

  test("mergeOnce equals a plain-Scala greedy reference on random sequences") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def reference(toks: Seq[String], a: String, b: String): Seq[String] = {
      val out = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += s"${a}_$b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    val gen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      a <- Gen.oneOf("a", "b", "c")
      b <- Gen.oneOf("a", "b", "c")
    } yield (toks, a, b)
    // one Spark job for all cases: build a DF of sequences, merge each
    val cases = (1 to 60).map(i => gen(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(fail(s"gen failed @$i")))
    cases.groupBy(c => (c._2, c._3)).foreach { case ((a, b), cs) =>
      val got = cs.zipWithIndex.map { case ((toks, _, _), j) => (j, toks) }
        .toDF("i", "toks")
        .select(col("i"), Bpe.mergeOnce(col("toks"), a, b).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      cs.zipWithIndex.foreach { case ((toks, _, _), j) =>
        assert(got(j) === reference(toks, a, b),
          s"pair ($a,$b) on $toks")
      }
    }
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
