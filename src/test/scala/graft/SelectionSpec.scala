package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Selection, TextAnalysis}

/** DSIR importance scoring, the deterministic epoch shuffle, and
  * span-level exact-substring dedup. */
class SelectionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // --------------------------------------------------------- dsirScores

  private val dsirDocs = Seq(
    // target slice: "alpha beta" bigrams everywhere
    (1L, "alpha beta alpha beta alpha beta", true),
    (2L, "alpha beta alpha beta", true),
    // raw-only noise: disjoint vocabulary
    (3L, "gamma delta gamma delta gamma delta", false),
    (4L, "epsilon zeta epsilon zeta", false),
    // a raw doc that LOOKS like the target — must outscore the noise
    (5L, "alpha beta alpha beta alpha", false),
    (6L, "x", false) // sub-n: no features, omitted
  ).toDF("doc_id", "text", "tgt")

  test("dsir: target-like raw docs outscore off-target docs; sub-n docs omitted") {
    val scores = Selection.dsirScores(dsirDocs, "doc_id", "text",
        isTarget = col("tgt"), n = 2, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!scores.contains(6L), "sub-n doc must be omitted")
    assert(scores(5L) > scores(3L) && scores(5L) > scores(4L),
      s"target-like doc must outscore noise: $scores")
    assert(scores(1L) > scores(3L))
  }

  test("dsir: score is the exact integer mean of per-bucket ratios") {
    // recompute by hand through the same definitions
    val g = dsirDocs.filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), col("tgt"),
        explode(expr("transform(sequence(0, size(split(text, ' ')) - 2), " +
          "i -> array_join(slice(split(text, ' '), i + 1, 2), ' '))")).as("gram"))
      .withColumn("bucket",
        graft.functions.PortableHash62.portableHash62(col("gram")) % 64)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(3)))
    val raw = g.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tgt = g.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expected = g.groupBy(_._1).map { case (id, fs) =>
      val rs = fs.map(f =>
        (tgt.getOrElse(f._3, 0L) + 1L) * 1000000L / (raw(f._3) + 1L))
      id -> rs.sum / rs.size
    }
    val got = Selection.dsirScores(dsirDocs, "doc_id", "text",
        isTarget = col("tgt"), n = 2, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  // --------------------------------------------------------- epochOrder

  private val ids = (0L until 100L).toDF("doc_id")

  test("epoch shuffle: each epoch is a contiguous 0-based permutation") {
    val out = Selection.epochOrder(ids, "doc_id", epochs = 3,
        batchSize = 16, numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 300)
    (1L to 3L).foreach { e =>
      val idx = out.filter(_._2 == e).map(_._3).sorted
      assert(idx === (0L until 100L).toArray, s"epoch $e")
    }
    // batches never straddle epochs and are DIV-aligned
    out.foreach { case (_, _, idx, b) => assert(b === idx / 16) }
  }

  test("epoch shuffle: equals the one-task row_number replay, any partitioning") {
    def run(parts: Int) = Selection.epochOrder(ids, "doc_id", epochs = 2,
        batchSize = 16, numPartitions = parts)
      .collect().map(r => (r.getLong(0), r.getLong(1))
        -> (r.getLong(2), r.getLong(3))).toMap
    val replay = ids
      .select(col("doc_id"), explode(sequence(lit(1), lit(2))).as("epoch"))
      .withColumn("_hraw", graft.functions.PortableHash62.portableHash62(
        concat(lit("ep"), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("_h", expr("(_hraw % 4294967296 * (_hraw div 4294967296)" +
        " + _hraw % 4294967296 + _hraw div 4294967296) % 1000000007"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("epoch")).orderBy(col("_h"), col("doc_id")))
        .cast("long") - 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)
        -> (r.getLong(4), r.getLong(4) / 16)).toMap
    assert(run(4) === replay)
    assert(run(13) === replay, "partition count must cancel out")
  }

  test("epoch shuffle: epochs are different permutations (seeded, not copies)") {
    val out = Selection.epochOrder(ids, "doc_id", epochs = 2, batchSize = 16)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    val e1 = out.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    val e2 = out.filter(_._1 == 2L).map(t => t._2 -> t._3).toMap
    assert(e1 !== e2)
  }

  test("curriculum: phases are non-decreasing along the tape, idx contiguous") {
    val docs = (0L until 90L).map(i => (i, i % 3)).toDF("doc_id", "tier")
    val out = Selection.curriculumOrder(docs, "doc_id", col("tier"),
        batchSize = 10, numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sorted === (0L until 90L).toArray)
    val byIdx = out.sortBy(_._3)
    assert(byIdx.map(_._2) === byIdx.map(_._2).sorted, "phase must ascend")
    out.foreach { case (_, _, idx, b) => assert(b === idx / 10) }
    // within a phase the order is NOT the id order (the shuffle shuffles)
    val p0 = byIdx.filter(_._2 == 0L).map(_._1)
    assert(p0.toSeq !== p0.sorted.toSeq)
  }

  // --------------------------------------------------------- dedupSpans

  test("dedup spans: overlapping and adjacent duplicated grams merge; unique docs absent") {
    val docs = Seq(
      // docs 1,2 share tokens a..f → grams at pos 0,1 overlap → one span [0,6)
      (1L, "a b c d e f x y z"),
      (2L, "q r a b c d e f"),
      // doc 3 shares nothing 5-gram-long with anyone
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array((1L, 0L, 6L, 6L), (2L, 2L, 8L, 6L)))
  }

  test("dedup spans: disjoint duplicated runs stay separate islands") {
    // shared run at the start AND at the end, a private middle
    val docs = Seq(
      (1L, "a b c d e m1 m2 m3 v w x y z"),
      (2L, "a b c d e n1 n2 n3 v w x y z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array((1L, 0L, 5L), (1L, 8L, 13L),
      (2L, 0L, 5L), (2L, 8L, 13L)))
  }

  test("excise: cuts removed, untouched docs verbatim, fully-covered docs empty") {
    val docs = Seq(
      (1L, "a b c d e f x y z"),   // cut [0,6) → "x y z"
      (2L, "q r a b c d e f"),     // cut [2,8) → "q r"
      (3L, "one two three four"),  // sub-n → verbatim
      (4L, "a b c d e f")          // shares its whole text with 1,2 → empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.exciseSpans(docs, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, "x y z", 3L), (2L, "q r", 2L),
      (3L, "one two three four", 4L), (4L, "", 0L)))
  }

  // --------------------------------------------------------- gopherRules

  test("gopher rules: each rule trips on its crafted violator only") {
    val good = ("the quick brown fox jumps with delight over the lazy dog and " +
      "that fence of wonder which we have seen before in many a tale told " +
      "by travelers passing through these quiet lands every autumn evening " +
      "bringing news of distant towns and the strange sights found there " +
      "so the story continues quietly onward")
    val docs = Seq(
      (1L, good),                                    // passes everything
      (2L, "too short to have fifty words"),         // word count
      (3L, good.replaceAll("\\b\\w+\\b", "ab")),     // mean word len < 3
      (4L, good + " " + Seq.fill(30)("#").mkString(" ")), // symbol ratio
      (5L, good.split(" ").map("- " + _).mkString("\n")), // bullet lines
      (6L, good.split(" ").map(_ + " ...").mkString("\n")), // ellipsis lines
      (7L, good.split(" ").map(w => "123").mkString(" ")), // alpha words
      (8L, good.replaceAll("\\b(the|and|with|that|have|of|to|be)\\b", "xx"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> (r.getBoolean(r.fieldIndex("r_word_count")),
          r.getBoolean(r.fieldIndex("r_mean_word_len")),
          r.getBoolean(r.fieldIndex("r_symbol_ratio")),
          r.getBoolean(r.fieldIndex("r_bullet_lines")),
          r.getBoolean(r.fieldIndex("r_ellipsis_lines")),
          r.getBoolean(r.fieldIndex("r_alpha_words")),
          r.getBoolean(r.fieldIndex("r_stop_words")),
          r.getBoolean(r.fieldIndex("keep")))
      }.toMap
    assert(out(1L) === ((true, true, true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._8)
    assert(!out(3L)._2)
    assert(!out(4L)._3)
    assert(!out(5L)._4)
    assert(!out(6L)._5)
    assert(!out(7L)._6)
    assert(!out(8L)._7 && out(8L)._1, "stopword violator must still have ≥50 words")
  }

  // ------------------------------------- groupedRank / groupedNtile

  /** Awkward group sizes on purpose: n < k, n = k, n % k ∈ {0, 1, 2},
    * plus duplicate order values resolved by the id tie-breaker. */
  private val ntileRows = {
    val rows = for {
      (grp, n) <- Seq("a" -> 1, "b" -> 3, "c" -> 4, "d" -> 6, "e" -> 11)
      i <- 1 to n
    } yield (grp, (i % 4).toLong, (i * 7 % n + n * 100).toLong)
    rows.toDF("grp", "v", "id")
  }

  test("groupedRank equals the window row_number") {
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val want = ntileRows.withColumn("rank", row_number().over(w))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3)).toMap
    val got = Selection.groupedRank(ntileRows, Seq("grp"), Seq("v", "id"),
        numPartitions = 5)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        r.getLong(r.fieldIndex("rank")).toInt).toMap
    assert(got === want)
  }

  test("groupedNtile closed form equals the window ntile for k = 1..5") {
    for (k <- 1 to 5) {
      val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
      val want = ntileRows.withColumn("b", ntile(k).over(w))
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3)).toMap
      val got = Selection.groupedNtile(ntileRows, Seq("grp"), Seq("v", "id"),
          k, numPartitions = 3)
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          r.getInt(r.fieldIndex("bucket_no"))).toMap
      assert(got === want, s"k=$k")
    }
  }

  // ------------------------------------------------ perplexityBuckets

  test("perplexityBuckets: per-group thirds ordered by score, sizes within 1") {
    val docs = (1L to 20L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // token mix varies per doc so scores spread
      val text = (("common " * (i % 5 + 1).toInt) + s"rare$i unique$i").trim
      (i, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = Selection.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(r.fieldIndex("nll_e4")), r.getString(r.fieldIndex("bucket"))))
    assert(out.length === 20)
    for (lang <- Seq("en", "de")) {
      val g = out.filter(_._2 == lang)
      val sizes = g.groupBy(_._4).view.mapValues(_.size).toMap
      assert(Set("head", "middle", "tail").subsetOf(sizes.keySet))
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang sizes: $sizes")
      // bucket order must follow (nll_e4, doc_id) order
      def key(t: (Long, String, Long, String)) = (t._3, t._1)
      val h = g.filter(_._4 == "head").map(key)
      val m = g.filter(_._4 == "middle").map(key)
      val tl = g.filter(_._4 == "tail").map(key)
      val ord = Ordering.Tuple2[Long, Long]
      assert(ord.lt(h.max, m.min) && ord.lt(m.max, tl.min),
        s"$lang buckets must be contiguous in score order")
    }
  }
}
