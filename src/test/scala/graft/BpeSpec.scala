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

  // ------------------------------------------------ one-pass apply

  private def applyBoth(toksSeqs: Seq[Seq[String]],
                        merges: Seq[(String, String)]): Unit = {
    val df = toksSeqs.zipWithIndex.map { case (ts, i) => (i, ts) }
      .toDF("i", "toks")
    val onePass = df.select(col("i"),
        Bpe.applyMerges(col("toks"), merges).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val seqCol = merges.foldLeft(col("toks")) { case (c, (a, b)) =>
      Bpe.mergeOnce(c, a, b)
    }
    val sequential = df.select(col("i"), seqCol.as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    toksSeqs.indices.foreach { i =>
      assert(onePass(i) === sequential(i),
        s"table $merges on ${toksSeqs(i)}")
    }
  }

  test("applyMerges: one-pass kernel equals the sequential mergeOnce fold") {
    applyBoth(
      Seq(Seq("a", "b", "c"), Seq("a", "a", "b"), Seq("a", "b", "a", "b"),
        Seq("a", "a", "a"), Seq("x"), Seq()),
      Seq(("a", "b"), ("a_b", "c"), ("a", "a_b")))
    // chained creations: (a,b) then (a_b,a_b); overlap parity inside
    applyBoth(Seq(Seq("a", "b", "a", "b", "a", "b")),
      Seq(("a", "b"), ("a_b", "a_b")))
  }

  test("applyMerges: rank-inconsistent and duplicate tables replay " +
      "sequential turn order exactly") {
    // (x,y) fuses AFTER (a,x_y)'s turn has passed: sequential never
    // merges a with x_y, even though the pair exists at the end
    applyBoth(Seq(Seq("a", "x", "y")), Seq(("a", "x_y"), ("x", "y")))
    // duplicate entry: second (a,b) turn re-fires after (c,a) recreates
    // nothing, but [a,b,a,b] consumed at turn 1 leaves nothing for turn 3
    applyBoth(Seq(Seq("a", "b", "a", "b"), Seq("a", "b", "c")),
      Seq(("a", "b"), ("c", "a_b"), ("a", "b")))
    // pair destroyed before its turn
    applyBoth(Seq(Seq("b", "c", "d")), Seq(("b", "c"), ("c", "d")))
    // pair recreated after its turn passed stays unmerged
    applyBoth(Seq(Seq("p", "q", "q", "r")),
      Seq(("q", "q"), ("p", "q"), ("q_q", "r")))
  }

  test("applyMerges: random corpora × random (possibly degenerate) tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val sym = Gen.oneOf("a", "b", "c", "a_b", "b_c")
    val gen = for {
      n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, sym)
      m <- Gen.choose(0, 6)
      ms <- Gen.listOfN(m, Gen.zip(sym, sym))
    } yield (toks, ms)
    val cases = (1 to 80).map(i => gen(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(fail(s"gen failed @$i")))
    cases.groupBy(_._2).foreach { case (merges, cs) =>
      applyBoth(cs.map(_._1), merges)
    }
  }

  test("applyMerges: empty table, null elements, null array") {
    applyBoth(Seq(Seq("a", "b")), Seq())
    val merges = Seq(("a", "b"), ("b", "a"))
    val df = Seq((1, Seq("a", null, "b", "a", "b")),
        (2, null.asInstanceOf[Seq[String]]), (3, Seq(null, null)),
        (4, Seq[String]()))
      .toDF("i", "toks")
    val got = df.select(col("i"),
        Bpe.applyMerges(col("toks"), merges).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[String](1))).toMap
    // the fold's null semantics, replayed: pass 1 can't fuse across the
    // null and drops it (null element ≡ empty-pending state), the
    // trailing (a,b) fuses; later passes see a null-free sequence
    val seqCol = merges.foldLeft(col("toks"))((c, m) => Bpe.mergeOnce(c, m._1, m._2))
    val sequential = df.select(col("i"), seqCol.as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[String](1))).toMap
    assert(got === sequential)
    assert(got(1) === Some(Seq("a", "b", "a_b")))
    assert(got(2) === None)
    assert(got(3) === Some(Seq()))
    // empty table on a null-bearing sequence: untouched
    val id = df.filter(col("i") === 1).select(
        Bpe.applyMerges(col("toks"), Seq()).as("m"))
      .head().getSeq[String](0)
    assert(id === Seq("a", null, "b", "a", "b"))
  }

  // --------------------------------------- sample-trained induction

  test("trainOnSample equals train on the same rows (whole-corpus sample)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(2, 10)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield toks
    val docs = (1 to 30).map(i => (i.toLong,
      gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(fail("gen"))))
      .toDF("doc_id", "toks")
    val viaSpark = Bpe.train(docs, "doc_id", rounds = 5)._2
      .map(m => (m._2, m._3))
    val viaDriver = Bpe.trainOnSample(docs, "doc_id", rounds = 5,
      maxTrainRows = 1000)
    assert(viaDriver === viaSpark)
  }

  test("trainOnSample: the sample is the first maxTrainRows docs in " +
      "portable-hash order, so it is partitioning-invariant") {
    val docs = (1 to 40).map(i =>
      (i.toLong, Seq.fill(3 + i % 4)(s"t${i % 7}"))).toDF("doc_id", "toks")
    val one = Bpe.trainOnSample(docs.repartition(1), "doc_id", 3, 10)
    val many = Bpe.trainOnSample(docs.repartition(13), "doc_id", 3, 10)
    assert(one === many)
    // and it really is a strict subset: training on 10 docs differs from
    // training on all 40 for this skewed corpus
    val full = Bpe.trainOnSample(docs, "doc_id", 3, 1000)
    assert(one !== full)
  }
}
