package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Multimodal, Similarity, SkewJoin, Splits, TextAnalysis}

/** Scale-extension operators: dedup family, ANN similarity, text analysis,
  * multimodal plumbing. */
class OpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup: identical texts share a hash; keep_id is the min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dups = out.filter(_._2 > 1)
    assert(dups.length === 1 && dups.head._2 === 2L && dups.head._3 === 1L)
    assert(out.length === 4) // 4 distinct texts
  }

  test("normalized dedup: case/punctuation/whitespace variants collide, content differences don't") {
    val variants = Seq(
      (1L, "The quick brown fox."),
      (2L, "the  quick   brown fox"),
      (3L, "THE QUICK, BROWN FOX!!"),
      (4L, "  the quick brown fox  "),
      (5L, "the slow brown fox")).toDF("doc_id", "text")
    val out = Dedup.exact(variants.withColumn("text", Dedup.normalized($"text")),
      "doc_id", "text").collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((4L, 1L), (1L, 5L)))
  }

  test("minhash LSH: exact dups get est_jaccard 1.0; near dups are candidates") {
    val out = Dedup.minhashLsh(docs.filter($"doc_id" <= 4), "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(!out.contains((1L, 4L)) || out((1L, 4L)) < 0.5)
  }

  test("simhash: identical docs at hamming 0; unrelated docs not paired at small radius") {
    val pairs = Dedup.simhashPairs(docs.filter($"doc_id" <= 4), "doc_id", "text",
      maxHamming = 3).collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(!pairs.contains((1L, 4L)))
  }

  test("simhash recall: hamming-5 pair spread across all four 16-bit chunks") {
    // Single-token docs make the fingerprint equal the token hash (every
    // bit's vote is ±1 from that one hash), so a controlled tokenHasher
    // pins the exact fingerprints: hB differs from hA=0 in 5 bits, one in
    // each of the four 16-bit chunks (two in the first) — the shape the
    // fixed-4-chunk scheme silently dropped.
    val pair = Seq((1L, "ta"), (2L, "tb")).toDF("doc_id", "text")
    val hasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => when(t === "ta", lit(0L))
        .otherwise(lit((1L << 0) | (1L << 1) | (1L << 16) | (1L << 32) | (1L << 48)))
    val at5 = Dedup.simhashPairs(pair, "doc_id", "text", maxHamming = 5,
      tokenHasher = hasher).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(at5.toSeq === Seq(((1L, 2L), 5)))
    // at the tight threshold the pair is correctly absent (hamming 5 > 3)
    assert(Dedup.simhashPairs(pair, "doc_id", "text", maxHamming = 3,
      tokenHasher = hasher).count() === 0)
  }

  test("simhash chunk bounds tile the 64 bits with k+1 chunks for any k") {
    for (k <- Seq(0, 1, 3, 5, 15, 31)) {
      val b = Dedup.chunkBounds(k)
      assert(b.length === k + 1)
      assert(b.head._1 === 0 && b.last._2 === 64)
      b.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi === lo)
                             case _ => }
      b.foreach { case (lo, hi) => assert(hi > lo) }
    }
    assertThrows[IllegalArgumentException](Dedup.chunkBounds(32))
  }

  test("portable token hash: deterministic, order-sensitive, high bits from the second fold") {
    val rows = Seq((1L, "abc"), (2L, "acb"), (3L, "abc")).toDF("id", "tok")
      .select($"id", Dedup.portableTokenHash($"tok").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) === rows(3L))
    assert(rows(1L) !== rows(2L))
    // matches the hand-computed double fold for "abc" (97,98,99)
    val lo = ((97L * 31 + 98) * 31 + 99) % 1000000007
    val hi = ((97L * 37 + 98) * 37 + 99) % 998244353
    assert(rows(1L) === (lo | (hi << 32)))
  }

  test("PortableHash62 expression ≡ HOF fold on ASCII/BMP text; null passes through") {
    val toks = Seq("", "a", "abc", "the quick brown fox", "12345!@#",
      "привет мир", "tab\tand newline\n", "long " * 50)
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tok")
      .select($"id",
        Dedup.portableTokenHash($"tok").as("expr_h"),
        Dedup.portableTokenHashHof($"tok").as("hof_h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}")
    }
    val nulls = Seq((1L, Option.empty[String])).toDF("id", "tok")
      .select(Dedup.portableTokenHash($"tok").as("h")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("ngram jaccard: hand-computed value for a near-dup pair") {
    // doc1/doc3 share 6 of their 7 trigrams each → |∩|=6, |∪|=8 → 0.75
    val out = Dedup.ngramJaccard(docs.filter($"doc_id".isin(1, 3)), "doc_id", "text",
      n = 3, minJaccard = 0.0, maxDocFreq = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.length === 1)
    val ((a, b), (common, j)) = out.head
    assert((a, b) === (1L, 3L) && common === 6L && j === 0.75)
  }

  test("prefix jaccard join: matches the exact all-pairs result, hand-checked pair included") {
    // 24 docs built from 4 base sentences with per-doc suffix variation —
    // overlapping shingle sets at a range of true Jaccards. The baseline
    // is ngramJaccard with maxDocFreq beyond any df (= exact all-pairs).
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota",
      "one two three four five six seven eight nine",
      "spark engines shuffle data across many executors daily")
    // ids 18-23 are exact duplicates of 0-5 so the t=0.8 case has pairs
    val varied = (0 until 18).map { i =>
      (i.toLong, bases(i % 4) + s" tail${i / 4} tail${i / 8} end")
    }
    val corpus = (varied ++ varied.take(6).map { case (i, s) => (i + 18, s) })
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP))))
      .toMap
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val exact = canon(Dedup.ngramJaccard(corpus, "doc_id", "text",
        n = 3, minJaccard = t, maxDocFreq = 1000000))
      val pruned = canon(graft.ops.SetJoin.prefixJaccardJoin(corpus, "doc_id", "text",
        n = 3, minJaccard = t))
      assert(pruned === exact, s"threshold $t")
      assert(exact.nonEmpty, s"threshold $t produced no pairs — fixture too weak")
    }
    // hand-checked: docs 1/3 from the OpsSpec corpus share 6 of 8 union trigrams
    val out = graft.ops.SetJoin.prefixJaccardJoin(
      docs.filter($"doc_id".isin(1, 3)), "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.toSeq === Seq(((1L, 3L), (6L, 0.75))))
  }

  test("prefix jaccard join: a universal stopword shingle generates no candidates at the prefix") {
    // every doc shares the 'common stop word*' shingles but differs in its
    // rare head — pairs below threshold must NOT surface, and the shared
    // shingles sort to the BACK of the canonical order (high-df suffix),
    // so they stay out of every prefix at t=0.8 (plen = 2 of 7, covered
    // by the three df=1 head shingles).
    val corpus = (0 until 40).map { i =>
      (i.toLong, s"rare$i unique$i head$i common stop word sequence here always")
    }.toDF("doc_id", "text")
    val out = graft.ops.SetJoin.prefixJaccardJoin(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.8)
    assert(out.count() === 0L)
    // sanity: the same corpus at a loose threshold does pair (true J = 4/10)
    val loose = graft.ops.SetJoin.prefixJaccardJoin(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.3)
    assert(loose.count() === 40L * 39 / 2)
  }

  test("containment join finds a quote inside a long page that Jaccard misses") {
    // doc 1 is a 6-token quote fully embedded in doc 2's 40-token page:
    // containment(1→2) = 1.0 while Jaccard ≈ 4/38 — far below any
    // useful threshold. Direction matters: the page is NOT contained
    // in the quote.
    val quote = "alpha beta gamma delta epsilon zeta"
    val page = ("intro words here " + quote + " " +
      (1 to 30).map(i => s"filler$i").mkString(" "))
    val corpus = Seq((1L, quote), (2L, page)).toDF("doc_id", "text")
    val out = graft.ops.SetJoin.prefixContainmentJoin(
      corpus, "doc_id", "text", n = 3, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 1000000L)))
    val jac = graft.ops.SetJoin.prefixJaccardJoin(
      corpus, "doc_id", "text", n = 3, minJaccard = 0.5)
    assert(jac.count() === 0L)
  }

  test("components collapse transitive near-dup chains; dedupCorpus keeps canonical docs") {
    // a~b, b~c must land in ONE cluster even though (a,c) was never a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "d"), (9L, "e"),
      (100L, "solo")).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(corpus, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 7L, 100L))
  }

  test("dedupCorpusBy keeps the best-quality member per component, tie-broken by id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val corpus = Seq(
      (1L, "a", 10L), (2L, "bbbb", 40L), (3L, "c", 10L),   // longest: 2
      (7L, "dd", 20L), (9L, "ee", 20L),                    // tie → min id 7
      (100L, "solo", 5L))                                  // untouched
      .toDF("doc_id", "text", "n_chars")
    val kept = Dedup.dedupCorpusBy(corpus, "doc_id", pairs, col("n_chars"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 7L, 100L))
  }

  test("unigram log-prob: hand-computed smoothed scores; empty doc emits no row") {
    val corpus = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(corpus, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // corpus: N=5 tokens, V=3 types; p(a)=2.5/6.5, p(b)=2.5/6.5, p(c)=1.5/6.5
    def e4(xs: Double*) = math.floor(-xs.sum / xs.size * 10000).toLong
    val pa = math.log(2.5 / 6.5); val pb = pa; val pc = math.log(1.5 / 6.5)
    assert(out === Map(1L -> ((3L, e4(pa, pa, pb))), 2L -> ((2L, e4(pb, pc)))))
  }

  test("alternating-star components ≡ GraphX Pregel on chains, cliques, forests, random graphs") {
    // The DataFrame CC (round 5) must label identically to the GraphX
    // reference it replaced. Shapes chosen to stress the algorithm:
    // a long path (worst case for min-propagation — O(n) rounds there,
    // O(log n) for alternating-star), a clique, a star entered via its
    // max id, duplicate + reversed edges, and a seeded random forest.
    val rng = new scala.util.Random(7)
    val randomEdges = Seq.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "path" -> (1L to 40L).sliding(2).map(s => (s(1), s.head)).toSeq,
      "clique" -> (for (a <- 10L to 15L; b <- 10L until a) yield (a, b)),
      "star-max-entry" -> Seq((99L, 5L), (99L, 6L), (99L, 7L)),
      "dups-reversed" -> Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L)),
      "random" -> randomEdges)
    for ((name, edges) <- shapes) {
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.components(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Dedup.componentsGraphx(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"shape=$name")
    }
  }

  test("incremental LSH ≡ full LSH restricted to new-touching pairs; re-ingest labels new_old") {
    // docs: 1~2 near-identical (old,old), 3~4 near-identical (old,new),
    // 5~6 near-identical (new,new); 7 unrelated old
    val mk = (i: Long, base: String) => (i, base)
    val body = "the quick brown fox jumps over the lazy dog again and again tonight"
    val corpus = Seq(
      mk(1, body + " alpha"), mk(2, body + " alpha beta"),
      mk(3, body + " gamma"), mk(7, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      mk(4, body + " gamma delta"), mk(5, body + " epsilon"), mk(6, body + " epsilon zeta")
    ).toDF("doc_id", "text")
    val idx = Dedup.lshIndex(corpus, "doc_id", "text")
    val inc = Dedup.incrementalPairs(idx, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    val full = Dedup.minhashLsh(corpus.union(batch), "doc_id", "text")
      .filter($"est_jaccard" >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newTouching = full.filter { case (a, b) => a >= 4 || b >= 4 }
    assert(inc.filter(_._2 == "new_old").keySet.intersect(newTouching) ===
      newTouching.filter { case (a, b) => a <= 3 || b <= 3 })
    assert(newTouching.subsetOf(inc.keySet))
    // no old-old pair may surface through the incremental path
    assert(inc.keySet.forall { case (a, b) => a >= 4 || b >= 4 })
    // re-ingest: doc 3 fed again as "new" pairs with old 3's twin via the
    // index AND itself-vs-index — its twin pair must label new_old
    val reIngest = Dedup.incrementalPairs(idx, corpus.filter($"doc_id" === 3), "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(3)))
    assert(reIngest.nonEmpty && reIngest.forall(_._2 == "new_old"))
  }

  test("embedding near-dup finds the identical vector pair") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (3L, Array(-1.0f, 0.3f, -0.5f, 0.9f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(embs, "vec_id", "embedding",
      minCos = 0.99, planes = 4, dim = 4)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("brute-force cosine top-k: identical vector ranks first with cos ≈ 1") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      Seq(1.0, 0.0), k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("LSH top-k finds the identical vector (same bucket by construction)") {
    val embs = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 0.6f else 0.4f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.lshTopK(embs, "vec_id", "embedding",
      Seq.fill(8)(0.5), k = 1, planes = 4)
    assert(top.collect().head.getLong(0) === 1L)
  }

  test("SimHash64 expression ≡ HOF fold on token-hash arrays") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "a completely different sentence entirely"),
      (4L, "x")).toDF("id", "text")
      .select($"id", transform(array_distinct(split($"text", "\\s+")),
        t => xxhash64(t)).as("th"))
      .select($"id",
        Dedup.simhashFromHashes($"th").as("expr_fp"),
        Dedup.simhashFromHashesHof($"th").as("hof_fp"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (id, e, h) => assert(e === h, s"id=$id") }
    val byId = rows.map(r => r._1 -> r._2).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(1L) !== byId(3L))
  }

  test("VectorDot expression ≡ HOF fold: values bit-equal, nulls match") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.1f, -0.2f), Array(0.3f, 0.7f)),
      (3L, Array(1.0f), Array(1.0f, 2.0f)),              // length mismatch
      (4L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
    val rows = df.select($"id",
        Similarity.dot($"a", $"b").as("expr_dot"),
        Similarity.dotHof($"a", $"b").as("hof_dot"))
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(rows(1L)._1 === rows(1L)._2)
    assert(rows(1L)._1.get === 32.0)
    assert(rows(2L)._1 === rows(2L)._2)
    assert(rows(3L)._1.isEmpty && rows(3L)._2.isEmpty)   // mismatch → null
    assert(rows(4L)._1 === Some(0.0))
    // mixed float/double inputs (the typedLit query-vector case)
    val mixed = df.filter($"id" === 1).select(
      Similarity.dot($"a", typedlit(Seq(4.0, 5.0, 6.0))).as("d")).collect()
    assert(mixed.head.getDouble(0) === 32.0)
    // SQL registration path (covers both functions in the shared list)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("vd")
    assert(spark.sql("SELECT vector_dot(a, b) AS d FROM vd WHERE id = 1")
      .collect().head.getDouble(0) === 32.0)
    assert(spark.sql("SELECT simhash64(array(1L)) AS h").head().getLong(0) === 1L)
  }

  test("knn graph: identical vectors are mutual rank-1 neighbors at cos 1.0") {
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.01f * i)
    val far = Array.tabulate(64)(i => if (i == 63) -1.0f else -0.01f * i)
    val embs = Seq((1L, e1), (2L, e1), (3L, far)).toDF("vec_id", "embedding")
    val out = Similarity.knnGraph(embs, "vec_id", "embedding", k = 1, planes = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 2L && math.abs(out(1L)._2 - 1.0) < 1e-9)
    assert(out(2L)._1 === 1L && math.abs(out(2L)._2 - 1.0) < 1e-9)
  }

  test("batch ANN: each query finds its identical corpus vector at rank 1") {
    val vecs = (0 until 3).map { j =>
      Array.tabulate(64)(i => if (i == j * 20) 1.0f else 0.02f * (i % 5))
    }
    val queries = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val corpus = vecs.zipWithIndex.map { case (v, i) => (100L + i, v) }
      .toDF("vec_id", "embedding")
    val out = Similarity.batchTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, planes = 4, probes = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0 until 3).foreach { i =>
      assert(out(i.toLong)._1 === 100L + i, s"query $i")
      assert(math.abs(out(i.toLong)._2 - 1.0) < 1e-9)
    }
  }

  test("random projection: basis vector projects to the plane's component") {
    val basis5 = Array.tabulate(64)(i => if (i == 5) 1.0f else 0.0f)
    val out = Similarity.randomProject(
      Seq((1L, basis5)).toDF("vec_id", "embedding"), "embedding", outDim = 3)
      .select($"p0", $"p1", $"p2").head()
    val planes = Similarity.hyperplanes(3, 64)
    (0 until 3).foreach { i =>
      assert(math.abs(out.getDouble(i) - planes(i)(5)) < 1e-12)
    }
  }

  test("tf-idf top terms: hand-computed scores, ubiquitous terms score zero") {
    val corpus = Seq(
      (1L, "spark spark shuffle the"),
      (2L, "flink shuffle the"),
      (3L, "duck the")).toDF("doc_id", "text")
    val out = graft.ops.Relevance.tfIdfTopTerms(corpus, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc1: spark tf=2 df=1 → 2·ln3; shuffle tf=1 df=2 → ln1.5; the df=3 → 0
    assert(out((1L, "spark")) === ((2L, 1L, math.floor(2.0 * math.log(3.0) * 1e6).toLong)))
    assert(out((1L, "shuffle")) === ((1L, 2L, math.floor(math.log(3.0 / 2.0) * 1e6).toLong)))
    assert(!out.contains((1L, "the"))) // rank 3, cut at k=2
    // doc3 keeps 'the' (only 2 terms): tfidf exactly 0 for df=N
    assert(out((3L, "the"))._3 === 0L)
  }

  test("bm25: doc with more query-term mass ranks first; non-matching docs absent") {
    val corpus = Seq(
      (1L, "join join join filter"),
      (2L, "join filter scan scan"),
      (3L, "scan filter scan scan")).toDF("doc_id", "text")
    val out = graft.ops.Relevance.bm25TopK(corpus, "doc_id", "text",
      queryTerms = Seq("join"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc3 never matches
    assert(out.head._3 > out(1)._3)             // tf=3 beats tf=1 at equal dl
    assert(out.forall(_._2 === 1L))
  }

  test("skew report surfaces the hot key and the NULL key with exact shares") {
    import graft.ops.Profile
    val rows = (Seq.fill(60)(Some("hot")) ++ Seq.fill(20)(Option.empty[String]) ++
      (1 to 20).map(i => Some(s"k$i"))).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }
    val df = rows.toDF("id", "key")
    val out = Profile.skewReport(df, "key", k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // 100 rows, 22 distinct keys; hot=60 rows (60%), NULL=20 (20%)
    assert(out(0) === ((1, "hot", 60L, 600000L, 100L, 22L,
      math.floor(60.0 * 22 * 100 / 100).toLong)))
    assert(out(1)._2 === "NULL" && out(1)._3 === 20L && out(1)._4 === 200000L)
    assert(out.length === 3 && out(2)._3 === 1L)
  }

  test("heavy hitters: the recount semi-join broadcasts candidates (tail dropped map-side)") {
    import graft.ops.Profile
    val df = (1L to 100L).map(i => (i, s"v${i % 7}")).toDF("id", "value")
    val plan = Profile.heavyHitters(df, "value", k = 3, capacity = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("heavy hitters: exact top-k under tight capacity; ties break lexicographically") {
    import graft.ops.Profile
    // Zipf-ish: value "v$i" appears 2^(10-i) times for i in 1..8, plus a
    // 500-value distinct tail of singletons. N = 1020 + 500; with
    // capacity 64 the guarantee threshold N/(cap+1) ≈ 23.4 — every true
    // top-5 count (512..32) clears it, so top-5 must be EXACT even
    // though the tail alone overflows each partition's summary.
    val rows = (1 to 8).flatMap(i => Seq.fill(1 << (10 - i))(s"v$i")) ++
      (1 to 500).map(i => s"tail$i")
    val df = scala.util.Random.shuffle(rows).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "value")
    val out = Profile.heavyHitters(df, "value", k = 5, capacity = 64).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === (1 to 5).map(i => (i, s"v$i", (1L << (10 - i)))))
    // guarantee precondition the fixture relies on (documents why exact)
    assert((1L << 5) > rows.size / 65)

    // tie-break: equal counts order by value ascending, rank dense-free
    val ties = Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(2)("z")
    val tdf = ties.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "value")
    val tout = Profile.heavyHitters(tdf, "value", k = 3, capacity = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(tout.toSeq === Seq((1, "a", 3L), (2, "b", 3L), (3, "z", 2L)))
  }

  test("phrase search: consecutive-token matches only, with counts and first position") {
    import graft.ops.Relevance
    val corpus = Seq(
      (1L, "the cat sat on the mat the cat sat again"),  // "the cat sat" ×2
      (2L, "cat the sat"),                               // words present, order wrong
      (3L, "the cat naps"),                              // prefix only
      (4L, "a lathe cat sat down"))                      // substring trap: "lathe"≠"the"
      .toDF("doc_id", "text")
    val idx = Relevance.positionalIndex(corpus, "doc_id", "text")
    val out = Relevance.phraseSearch(idx, Seq("the", "cat", "sat")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 1)))
    // repeated-word phrase: overlapping occurrences each count
    val rep = Seq((9L, "go go go stop")).toDF("doc_id", "text")
    val ridx = Relevance.positionalIndex(rep, "doc_id", "text")
    val rout = Relevance.phraseSearch(ridx, Seq("go", "go")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rout.toSeq === Seq((9L, 2L, 1)))
  }

  test("MaxScore-pruned BM25 ≡ exact BM25: stopword-heavy, all-rare, and tiny corpora") {
    import graft.ops.Relevance
    val rnd = new scala.util.Random(5)
    // 200 docs all containing the stopword; every 10th also carries one
    // of two salient terms — the shape pruning exists for
    val corpus = (1L to 200L).map { i =>
      val filler = Seq.fill(5 + rnd.nextInt(10))("common").mkString(" ")
      val salient = if (i % 10 == 0) " needle" else if (i % 10 == 5) " probe" else ""
      (i, s"$filler the$salient")
    }.toDF("doc_id", "text")
    for (q <- Seq(Seq("needle", "probe", "the", "common"),
                  Seq("needle", "probe"),       // all-rare: prune breaks even
                  Seq("common", "the"),         // all-frequent
                  Seq("absent_term"))) {        // no matches at all
      val exact = Relevance.bm25TopK(corpus, "doc_id", "text", q, k = 15)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val pruned = Relevance.bm25TopKPruned(corpus, "doc_id", "text", q, k = 15)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(pruned === exact, s"query=$q")
    }
    // k larger than the matched-doc count: everything must survive
    val small = Seq((1L, "x y"), (2L, "y z"), (3L, "z")).toDF("doc_id", "text")
    assert(Relevance.bm25TopKPruned(small, "doc_id", "text", Seq("y", "z"), k = 10)
      .collect().map(_.getLong(0)).toSet ===
      Relevance.bm25TopK(small, "doc_id", "text", Seq("y", "z"), k = 10)
        .collect().map(_.getLong(0)).toSet)
  }

  test("batch BM25 ≡ per-query BM25 for every query in the table") {
    import graft.ops.Relevance
    val corpus = docs // the shared OpsSpec doc fixture
    val queries = Seq(("a", "quick brown"), ("b", "lazy dog fox"),
      ("c", "absent_term")).toDF("query_id", "qtext")
    val batch = Relevance.bm25BatchTopK(corpus, "doc_id", "text",
      queries, "query_id", "qtext", k = 5)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(4))
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq).toMap
    for ((qid, terms) <- Seq("a" -> Seq("quick", "brown"),
      "b" -> Seq("lazy", "dog", "fox"), "c" -> Seq("absent_term"))) {
      val single = Relevance.bm25TopK(corpus, "doc_id", "text", terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) === single, s"query=$qid")
    }
  }

  test("bloom-pruned join ≡ plain join; the sketch prunes non-matching probe rows") {
    val probe = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "pv")
    val build = Seq((5L, "a"), (10L, "b"), (999L, "c")).toDF("bk", "bv")
    val out = graft.ops.BloomJoin.inner(probe, build, "k", "bk", expectedItems = 10)
    val plain = probe.join(build, $"k" === $"bk")
    assert(out.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
    // the predicate alone prunes: 3 true keys + ~3% fp of 997 others
    val bloom = graft.ops.BloomJoin.keyFilter(build, "bk", expectedItems = 10)
    val survivors = probe.filter(graft.ops.BloomJoin.mightContain(bloom, $"k")).count()
    assert(survivors >= 3 && survivors < 150, s"survivors=$survivors")
    // and it enters the probe side as a might_contain predicate (on this
    // in-memory fixture ConvertToLocalRelation folds the filter into the
    // LocalTableScan at optimize time, so assert the analyzed plan)
    assert(out.queryExecution.analyzed.toString.contains("might_contain"))
    // on a parquet scan the predicate survives to the physical plan, in the
    // same codegen stage as the scan — the shape j9_bloom_join relies on
    val dir = java.nio.file.Files.createTempDirectory("bloomjoin").toString
    probe.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val out2 = graft.ops.BloomJoin.inner(pq, build, "k", "bk", expectedItems = 10)
    assert(out2.queryExecution.executedPlan.toString.contains("might_contain"))
    assert(out2.collect().map(_.toSeq).toSet === plain.collect().map(_.toSeq).toSet)
  }

  test("bloom join: oversized sketch and bad params fail loudly, not silently clamp") {
    val build = Seq((1L, "a")).toDF("bk", "bv")
    val e = intercept[IllegalArgumentException] {
      graft.ops.BloomJoin.keyFilter(build, "bk", expectedItems = 100000000L)
    }
    assert(e.getMessage.contains("maxNumBits"))
    assertThrows[IllegalArgumentException] {
      graft.ops.BloomJoin.keyFilter(build, "bk", expectedItems = 0L)
    }
    assertThrows[IllegalArgumentException] {
      graft.ops.BloomJoin.keyFilter(build, "bk", expectedItems = 10L, fpp = 1.5)
    }
  }

  test("salted equi-join ≡ plain join on a hot-key fixture") {
    // 90 of 100 probe rows share one key — the salting target
    val probe = (1 to 100).map(i => (if (i <= 90) 1L else i.toLong, i.toLong))
      .toDF("k", "rowid")
    val build = Seq((1L, "hot"), (95L, "cold")).toDF("k", "attr")
    val plain = probe.join(build, Seq("k")).select("k", "rowid", "attr")
    val salted = SkewJoin.saltedEquiJoin(probe, build, Seq("k"),
      salts = 4, discriminator = col("rowid")).select("k", "rowid", "attr")
    assert(salted.collect().toSet === plain.collect().toSet)
    assert(salted.count() === 91)
  }

  test("token counting: whitespace and BPE-ish regex variants") {
    val rows = Seq((1L, "hello world 42 foo-bar"), (2L, ""))
      .toDF("id", "text")
      .select($"id", TextAnalysis.tokenCount($"text").as("t"),
        TextAnalysis.regexTokenCount($"text").as("rt"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) === ((4L, 6L)))  // hello|world|42|foo|-|bar
    assert(rows(2L)._1 === 0L)
  }

  test("occurrences and rolling hash are deterministic and order-sensitive") {
    val df = Seq((1L, "ab ba"), (2L, "ba ab"), (3L, "ab ba")).toDF("id", "text")
      .select($"id", TextAnalysis.occurrences($"text", "ab").as("occ"),
        TextAnalysis.rollingHash($"text").as("h"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 === 1L))
    val h = rows.map(r => r._1 -> r._3).toMap
    assert(h(1L) === h(3L))
    assert(h(1L) !== h(2L))
  }

  test("language ID picks the marker-winning language; no hits → 'und'") {
    val out = TextAnalysis.languageId(Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "le chat et la maison et le chien"),
      (3L, "xyz qqq zzz")).toDF("doc_id", "text"), "text")
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "fr")
    assert(out(3L) === "und")
  }

  test("multimodal: stub decode is deterministic; null content → decode_ok=false") {
    val media = Seq((1L, "some media bytes"), (2L, "some media bytes"))
      .toDF("media_id", "txt")
      .select($"media_id", $"txt".cast("binary").as("content"))
      .union(Seq((3L, null: String)).toDF("media_id", "txt")
        .select($"media_id", $"txt".cast("binary").as("content")))
    val m = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(r => (r.getLong(0), (Option(r.get(1)), r.getBoolean(2)))).toMap
    assert(m(1L)._1 === m(2L)._1 && m(1L)._2)
    assert(m(3L)._1.isEmpty && !m(3L)._2)
  }

  test("chunking: full coverage with overlap, short tail, sub-chunk and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),  // 10 tokens
      (2L, "a b"),                                      // shorter than a chunk
      (3L, ""),                                         // empty → no chunks
      (4L, "solo"),                                     // 1 token ≤ overlap
      (5L, "\t\n ")                                     // whitespace-only → no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // stride 3: ceil((10-1)/3) = 3 chunks, overlapping by one token
    assert(d1.map(c => (c._3, c._4)).toSeq === Seq(
      ("w1 w2 w3 w4", 4L), ("w4 w5 w6 w7", 4L), ("w7 w8 w9 w10", 4L)))
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b", 2L)))
    assert(!out.exists(_._1 == 3L))
    // a doc with 1..overlap tokens still gets its one (short) chunk —
    // the raw ceil would zero out and silently drop it from the corpus
    assert(out.filter(_._1 == 4L).toSeq === Seq((4L, 0L, "solo", 1L)))
    // tab/newline-only is as empty as "" (trim() would miss this)
    assert(!out.exists(_._1 == 5L))
    // every token of doc 1 appears in some chunk (coverage)
    assert((1 to 10).forall(i => d1.exists(_._3.split(" ").contains(s"w$i"))))
  }

  test("splits: deterministic, exhaustive, and weight-normalized") {
    val df = (1L to 2000L).toDF("id")
    val a = Splits.assignSplit(df, "id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // same frame twice → identical assignment (pure function of id)
    val b = Splits.assignSplit(df, "id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.sum === 2000L)          // every row gets exactly one split
    assert(a("train") > a("val") && a("train") > a("test"))
    assert(math.abs(a("train") - 1600L) < 200, s"train share off: $a")
    // weights normalize: (2,1,1) ≡ (0.5,0.25,0.25)
    val c = Splits.assignSplit(df, "id",
      Seq("x" -> 2.0, "y" -> 1.0, "z" -> 1.0)).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(c("x") - 1000L) < 150, s"normalized share off: $c")
  }

  test("meanPoolE6: hand-computed elementwise means, negatives included") {
    val embs = Seq(
      ("a", Seq(1.0f, -0.5f)), ("a", Seq(2.0f, -1.5f)), ("b", Seq(10.0f, 0.25f)))
      .toDF("grp", "vec")
    val out = Similarity.meanPoolE6(embs, "grp", "vec").collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", 0)) === ((2L, 3000000L, 1500000L)))
    assert(out(("a", 1)) === ((2L, -2000000L, -1000000L)))
    assert(out(("b", 0)) === ((1L, 10000000L, 10000000L)))
    assert(out(("b", 1)) === ((1L, 250000L, 250000L)))
  }

  test("sampleExactPerGroup: exactly k per big group, whole small groups, deterministic") {
    val rows = (1L to 300L).map(i => (i, if (i <= 288) "big" else s"tiny${i % 3}"))
      .toDF("id", "grp")
    val out = Splits.sampleExactPerGroup(rows, "id", Seq("grp"), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byGrp = out.groupBy(_._1)
    assert(byGrp("big").length === 5)
    // 12 tiny rows over 3 groups (4 each, under k) — all survive, ranks contiguous
    assert(byGrp.filterKeys(_ != "big").values.map(_.length).sum === 12)
    assert(byGrp.values.forall(g => g.map(_._2).sorted.toSeq === (1 to g.length)))
    // pure function of the id: rerun identical
    val rerun = Splits.sampleExactPerGroup(rows, "id", Seq("grp"), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rerun.toSet === out.toSet)
  }

  test("repetitionSignals: hand-computed ratios; empty doc emits no row") {
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc1 "the quick brown fox jumps over the lazy dog": 9 tokens, 8
    // distinct, 'the'×2 → top 2/9, ttr 8/9
    assert(out(1L) === ((9L, 8L, 2L,
      math.floor(2.0 / 9 * 1e6).toLong, math.floor(8.0 / 9 * 1e6).toLong)))
    assert(!out.contains(5L)) // doc5 is empty
  }

  test("capPerGroup: small groups survive whole, big groups cap near target, caps nest") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 950) "big" else "small"))
      .toDF("id", "grp")
    val kept100 = Splits.capPerGroup(rows, "id", "grp", cap = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("grp")))
    // the 50-row group is under the cap: all kept
    assert(kept100.count(_._2 == "small") === 50)
    // the 950-row group keeps a hash-uniform ~100 subset
    val big100 = kept100.filter(_._2 == "big").map(_._1).toSet
    assert(big100.size > 60 && big100.size < 140, s"kept ${big100.size}")
    // determinism: a rerun keeps the identical row set
    val rerun = Splits.capPerGroup(rows, "id", "grp", cap = 100L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(rerun === kept100.map(_._1).toSet)
    // nesting: cap 50 ⊆ cap 100
    val big50 = Splits.capPerGroup(rows, "id", "grp", cap = 50L)
      .collect().filter(_.getAs[String]("grp") == "big").map(_.getAs[Long]("id")).toSet
    assert(big50.subsetOf(big100))
  }

  test("k-fold: folds partition the corpus, slices are disjoint and complete, reruns identical") {
    val ids = (1L to 500L).map(i => Tuple1(i)).toDF("id")
    val assigned = Splits.assignFold(ids, "id", k = 5)
    val byFold = assigned.groupBy($"fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byFold.keySet === (0L to 4L).toSet)
    assert(byFold.values.sum === 500L)
    // roughly uniform (hash buckets): each fold within [60, 140] of 100
    assert(byFold.values.forall(n => n >= 60 && n <= 140), byFold.toString)
    val (train, holdout) = Splits.foldSlices(assigned, 2)
    assert(train.count() + holdout.count() === 500L)
    assert(train.filter($"fold" === 2).count() === 0L)
    val again = Splits.assignFold(ids, "id", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === assigned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("sampleByWeight: keep rate tracks the weight, endpoints exact, reruns identical") {
    // weights 0, 1/2, 1 over disjoint id ranges
    val rows = (1L to 3000L).map { i =>
      (i, if (i <= 1000) 0L else if (i <= 2000) 5000L else 10000L)
    }.toDF("id", "w")
    val kept = Splits.sampleByWeight(rows, "id", "w", weightDen = 10000L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept.count(_ <= 1000) === 0)            // weight 0: nothing
    assert(kept.count(_ > 2000) === 1000)          // weight 1: everything
    val mid = kept.count(i => i > 1000 && i <= 2000)
    assert(mid > 380 && mid < 620, s"half-weight kept $mid of 1000")
    val rerun = Splits.sampleByWeight(rows, "id", "w", weightDen = 10000L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(rerun === kept)
  }

  test("crossContamination: a contained benchmark item flags its source, an unrelated one doesn't") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark physical plans")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "quick brown fox jumps over"),       // contained in doc 1
      (11L, "unrelated benchmark question text entirely")
    ).toDF("bench_id", "text")
    val out = Dedup.crossContamination(corpus, "doc_id", "text",
      bench, "bench_id", "text", n = 3, minOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 10L, 1.0)))
  }

  test("profile: one-pass tall summary counts nulls/distincts, min/max across types") {
    val df = Seq(
      (Some(3.5), Some("b")), (None, Some("a")), (Some(1.25), None),
      (Some(3.5), Some("b")))
      .toDF("d", "s")
    val p = graft.ops.Profile.summarize(df, Seq("d", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("d") === (4L, 1L, 2L, "1.25", "3.5"))  // nulls excluded from distinct/minmax
    assert(p("s") === (4L, 1L, 2L, "a", "b"))
  }

  test("PII redaction: emails, cards, phones masked; clean text untouched") {
    val rows = Seq(
      (1L, "mail me at john.doe+x@corp.example.org thanks"),
      (2L, "card 4276123456781234 charged"),
      (3L, "call +7 915 123-45-67 now"),
      (4L, "a perfectly clean sentence"),
      (5L, "both a@b.io and 12345678 90123456"))
      .toDF("doc_id", "text")
      .select($"doc_id", graft.ops.TextAnalysis.redactPii($"text").as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "mail me at <EMAIL> thanks")
    assert(rows(2L) === "card <CARD> charged")       // card pass wins over phone
    assert(rows(3L) === "call <PHONE> now")
    assert(rows(4L) === "a perfectly clean sentence")
    assert(rows(5L) === "both <EMAIL> and <PHONE>")
  }

  test("int8 quantization: bounded roundtrip error, near-exact cosine, zero-vector safe") {
    val embs = Seq(
      (1L, Array(0.9f, -0.3f, 0.05f, 0.254f)),
      (2L, Array(12.7f, 0.1f, -12.7f, 3.3f)),
      (3L, Array(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(embs, "embedding")
    val checked = q.filter($"vec_id" =!= 3L)   // cosine undefined at zero
      .select($"vec_id", $"scale",
        // max |dequant - v| must be within scale/2 (half quantization step)
        aggregate(zip_with(Similarity.dequantize($"q", $"scale"),
            transform($"embedding", x => x.cast("double")),
          (a, b) => abs(a - b)), lit(0.0), (acc, v) => greatest(acc, v)).as("err"),
        Similarity.cosine(Similarity.dequantize($"q", $"scale"), $"embedding").as("qcos"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(checked(id).getDouble(2) <= checked(id).getDouble(1) / 2 + 1e-12)
      assert(checked(id).getDouble(3) > 0.999, s"cosine degraded: ${checked(id)}")
    }
    assert(q.filter($"vec_id" === 3L).head().getDouble(2) === 0.0)   // scale 0
    val q3 = q.filter($"vec_id" === 3L).select($"q").head().getSeq[Byte](0)
    assert(q3.forall(_ === 0))
  }

  test("sessionize: gap strictly over the threshold opens a session; boundary gap does not") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2021-01-01 10:00:00")),
      (1L, 2L, ts("2021-01-01 10:30:00")),   // gap 1800 = threshold → same session
      (1L, 3L, ts("2021-01-01 11:00:01")),   // gap 1801 → NEW session
      (2L, 4L, ts("2021-01-01 10:00:00")))   // other entity independent
      .toDF("user_id", "event_id", "ts")
    val out = graft.ops.Sessionize.sessions(ev, "user_id", "ts", "event_id", 1800L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out((1L, 0L)) === (2L, 1800L))   // events 1+2, span 30 min
    assert(out((1L, 1L)) === (1L, 0L))      // event 3 alone
    assert(out((2L, 0L)) === (1L, 0L))
  }

  test("multimodal: frame sampling emits bounded per-media frame rows") {
    val media = Seq((1L, 45000L), (2L, 500000L), (3L, 0L)).toDF("media_id", "dur")
      .select($"media_id", struct(lit("video").as("media_type"), lit("mp4").as("format"),
        lit(0).as("width"), lit(0).as("height"), $"dur".as("duration_ms")).as("meta"))
    val counts = Multimodal.sampleFrames(media, stride = 10, maxFrames = 8)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) === 5L)   // 45 s / 10 → 4 → frames 0..4
    assert(counts(2L) === 9L)   // capped at maxFrames → 0..8
    assert(counts(3L) === 1L)   // frame 0 only
  }

  test("winnow: any shared token run of length >= w+k-1 yields a shared " +
      "fingerprint; short docs and edits behave per the MOSS contract") {
    import graft.ops.TextAnalysis
    val k = 3; val w = 4
    val sharedRun = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val docs = Seq(
      (1L, s"unrelated prefix words here $sharedRun and a tail"),
      (2L, s"$sharedRun completely different continuation text now"),
      (3L, "tiny doc"),                      // < k tokens: no fingerprints
      (4L, "one two three")                  // exactly k tokens: 1 gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnow(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the SIGMOD'03 guarantee: docs 1 and 2 share a w+k-1 run
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      s"no shared fingerprint across the shared run: $byDoc")
    assert(!byDoc.contains(3L), "sub-k doc must yield no fingerprints")
    assert(byDoc(4L).size === 1, "a k-token doc has exactly one gram/fp")
    // density: selections are a strict subset of gram positions
    val doc1Grams = docs.filter($"doc_id" === 1L)
      .select(size(split($"text", " "))).head().getInt(0) - k + 1
    assert(byDoc(1L).size < doc1Grams)
    // rightmost-min tie rule is deterministic: rerun is identical
    val again = TextAnalysis.winnow(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet === out.toSet)
  }

  test("winnowPairs: order-sensitive copy detection — a moved paragraph " +
      "still pairs, disjoint docs never do") {
    import graft.ops.TextAnalysis
    val para = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (10L, s"intro sentence goes first $para closing words"),
      (11L, s"$para then entirely new material follows afterwards"),
      (12L, "totally different content about spark shuffles and parquet files"),
      (13L, "more unrelated text concerning window functions and joins only")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 2, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)), s"moved paragraph not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L || p._1 == 13L || p._2 == 13L))
  }

  test("rougeN: clipped bigram overlap gives exact e4 P/R/F1; repeats clip; " +
      "no-overlap pairs still emit a zero row") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "a b c d"),   // bigrams {ab, bc, cd}
      (2L, "a b c x"),   // bigrams {ab, bc, cx}
      (3L, "a a a a"),   // bigrams {aa x3} — clipping case
      (4L, "a a b b")    // bigrams {aa, ab, bb}
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val out = TextAnalysis.rougeN(docs, "doc_id", "text", pairs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // (1,2): overlap {ab, bc} = 2 of 3 each side -> P=R=F1=6666
    assert(out((1L, 2L)) === ((2L, 3L, 3L, 6666L, 6666L, 6666L)))
    // (3,4): ref has aa x3, cand has aa x1 -> clipped overlap 1, not 3
    assert(out((3L, 4L)) === ((1L, 3L, 3L, 3333L, 3333L, 3333L)))
    // (1,3): disjoint gram sets -> zero row, pair NOT dropped
    assert(out((1L, 3L)) === ((0L, 3L, 3L, 0L, 0L, 0L)))
  }

  test("repeatedNgrams: cross-doc verbatim sequences surface with exact " +
      "doc and occurrence counts; within-doc repeats alone do not") {
    import graft.ops.TextAnalysis
    val boiler = "subscribe to our newsletter for updates" // 6 tokens
    val docs = Seq(
      (1L, s"article one body text $boiler trailing words"),
      (2L, s"$boiler article two completely different body"),
      (3L, s"third article also ends with $boiler"),
      // within-doc repetition only — must NOT appear at minDocs=2
      (4L, "echo echo echo echo echo echo echo echo echo echo"),
      (5L, "short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgrams(docs, "doc_id", "text",
      n = 5, minDocs = 2) // gram -> (n_docs, n_occ)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the 6-token boilerplate yields two 5-gram windows, each in 3 docs
    val w1 = "subscribe to our newsletter for"
    val w2 = "to our newsletter for updates"
    assert(out.get(w1).contains((3L, 3L)), s"missing $w1: $out")
    assert(out.get(w2).contains((3L, 3L)), s"missing $w2: $out")
    // doc 4's 6 within-doc "echo..." grams never cross a doc boundary
    assert(!out.keys.exists(_.startsWith("echo")),
      s"within-doc repetition leaked into the cross-doc table: $out")
    // every surviving gram is in >= 2 docs and occ >= docs
    assert(out.values.forall { case (d, o) => d >= 2 && o >= d })
  }

  test("duplicatedGramFraction: fully-duplicated docs score 10000 bp, " +
      "originals 0, a quoting doc in between; sub-n docs emit no row") {
    import graft.ops.TextAnalysis
    val boiler = "one two three four five" // exactly one 5-gram
    val docs = Seq(
      (1L, boiler),                                   // 1/1 dup -> 10000
      (2L, boiler),                                   // 1/1 dup -> 10000
      (3L, s"fresh unique opening words here $boiler"), // 6 grams, 1 dup
      (4L, "entirely original content with no repeats anywhere at all"),
      (5L, "tiny")                                    // < n tokens: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedGramFraction(docs, "doc_id", "text",
      n = 5, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((1L, 1L, 10000L)))
    assert(out(2L) === ((1L, 1L, 10000L)))
    assert(out(3L) === ((6L, 1L, 1666L)), s"quoting doc: ${out(3L)}")
    assert(out(4L)._2 === 0L && out(4L)._3 === 0L)
    assert(!out.contains(5L), "sub-n doc must emit no row")
  }

  test("repeatedNgrams partial+merge == direct, including grams whose " +
      "duplication only exists ACROSS batches") {
    import graft.ops.TextAnalysis
    val boiler = "click here to learn more"
    val docs = Seq(
      (1L, s"batch one doc body $boiler"),     // doc_id % 3 = 1
      (2L, s"$boiler batch two doc body"),     // doc_id % 3 = 2: the
      // boiler gram is a SINGLETON in each batch — only merge sees 2
      (3L, "unique text in one batch only"),
      (4L, "more unique text somewhere else"),
      (5L, "third doc with entirely original closing words")
    ).toDF("doc_id", "text")
    val direct = TextAnalysis.repeatedNgrams(docs, "doc_id", "text",
      n = 5, minDocs = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val states = (0 to 2).map(b => TextAnalysis.repeatedNgramsPartial(
      docs.filter(pmod($"doc_id", lit(3)) === b), "doc_id", "text", n = 5))
      .reduce(_ unionByName _)
    val merged = TextAnalysis.repeatedNgramsMerge(states, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === direct, s"merge drift:\n merged=$merged\n direct=$direct")
    // the boiler gram is singleton in every batch — only merge finds it
    assert(direct.exists(_._1 == boiler), s"fixture lost its cross-batch gram")
  }

  test("corpusCard: exact per-stratum volumes; cross-strata byte-exact " +
      "copies count in EVERY stratum that holds one") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "web", "en", "shared page body text"),   // dup of doc 3 (cross-strata)
      (2L, "web", "en", "original web english doc"),
      (3L, "books", "en", "shared page body text"), // dup of doc 1
      (4L, "books", "de", "einzigartiger deutscher text")
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextAnalysis.corpusCard(docs, "doc_id", "text",
      Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7))).toMap
    // (n_docs, n_tokens, avg_tokens, n_exact_dup)
    assert(out(("web", "en")) === ((2L, 8L, 4L, 1L)),
      s"web/en card wrong: ${out(("web", "en"))}")
    assert(out(("books", "en")) === ((1L, 4L, 4L, 1L)),
      "the books copy of a web page must count as a dup in books/en")
    assert(out(("books", "de")) === ((1L, 3L, 3L, 0L)))
  }
}
