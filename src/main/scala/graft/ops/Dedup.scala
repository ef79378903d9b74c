package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation — the
  * training-data-pipeline surface this engine adds beyond the reference
  * (which has only the blacklist anti-join dedup, main.py:382-393).
  *
  * All operators are `DataFrame => DataFrame`, shuffle only on compact
  * derived keys (hashes / bands), and never collect to the driver — the
  * properties that make them viable at 100 TB.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup via content hash: one row per distinct text with the
    * duplicate count and the kept (minimum) id. Shuffles 16-byte md5 keys
    * instead of full documents — at 100 TB the shuffle payload is the
    * hash + id, not the text. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol).cast("binary")).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min(col(idCol)).as("keep_id"))

  /** Dedup-canonical text: lowercase, punctuation stripped, whitespace
    * runs collapsed to one space, trimmed. The standard normalization
    * pass before exact hashing — web-scraped corpora carry the same
    * sentence under differing case/punctuation/indentation, and raw
    * [[exact]] treats every variant as unique. Portable character
    * classes only (identical semantics in Java regex and RE2/DuckDB),
    * so the oracle replays the scrub byte-for-byte. */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\p{Punct}]", ""),
      "\\s+", " "))

  // --------------------------------------------------------- shingling

  /** Word n-gram shingles of `textCol` (whitespace tokenization),
    * distinct per document. The `transform(array(...), toks => ...)`
    * wrapper is a let-binding: it forces the token split to evaluate ONCE
    * per row — naively inlining it into the per-index lambda re-tokenizes
    * the document for every shingle (measured 40 ms/doc → 0.1 ms/doc).
    * A document with fewer than `n` tokens has NO length-n shingles —
    * the guard returns an empty array rather than a degenerate short
    * shingle, matching the oracle's windowed trigram CTE (which QUALIFYs
    * the full n-token window). */
  def shingles(textCol: Column, n: Int): Column =
    flatten(transform(array(split(textCol, "\\s+")), toks =>
      when(size(toks) >= n,
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<string>"))))

  // ----------------------------------------------------------- minhash

  /** MinHash signature: for each of `numHashes` seeded permutations take
    * the min of `xxhash64(shingle, seed)` over the document's shingle set.
    * Pure codegen'd expressions — no UDF. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(seed))))
    }: _*)

  /** MinHash + LSH banding candidate pairs (the scale path for near-dup):
    * signature split into `bands` bands of `rowsPerBand`; documents
    * agreeing on all rows of any band land in the same bucket; bucket
    * join yields candidate pairs (a < b). Shuffles (band, bucket-hash)
    * keys only. Est. Jaccard = fraction of agreeing signature positions.
    *
    * `maxBucketSize` bounds the per-bucket pair blowup (VERDICT r2 #4): a
    * bucket of n docs yields n(n-1)/2 candidate pairs ON ONE REDUCER, so
    * one degenerate cluster (scraped boilerplate repeated 10⁶ times)
    * melts a task while every other bucket is tiny. Buckets over the cap
    * are dropped from pair generation — for a cap this size the lost
    * pairs are overwhelmingly a true-duplicate clique whose membership
    * is recovered far cheaper by [[exact]] pre-collapse (identical docs
    * collide in EVERY band, so they contribute nothing but the blowup);
    * [[droppedLshBuckets]] reports exactly what was skipped, and
    * DedupPropertySpec pins cap + recall behavior. The count rides the
    * same (band, bucket) exchange the self-join reuses — no extra
    * shuffle. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                 maxBucketSize: Long = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val banded = lshBanded(docs, idCol, textCol, shingleN, bands, rowsPerBand)
      // per-bucket population over the SAME partitioning (no added
      // exchange); over-cap buckets sit out of pair generation.
      // NO eager checkpoint here (r19 negative result): unlike
      // ngramJaccard's compact posting list, this frame carries the
      // 8x-banded signature arrays — materializing it cost MORE than
      // the duplicated window sort it saves (paired A/B: 0.88-0.98x
      // across the whole minhash family). Don't re-try.
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")

    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      // Dedup on ids BEFORE the signature comparison so a pair colliding
      // in k bands pays for one estimate, not k.
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        sigAgreement(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
  }

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * positions. */
  private def sigAgreement(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** The persistable LSH band index of a corpus — (doc_id, sig, band,
    * bucket), the exact stage [[minhashLsh]] self-joins — with over-cap
    * buckets dropped AT BUILD TIME (same degenerate-cluster valve, same
    * default). Write it once per corpus (e.g.
    * `catalog.overwrite("lsh_index", Dedup.lshIndex(corpus, ...))`) and
    * incremental batches join against it via [[incrementalPairs]] without
    * ever re-shingling the corpus — the property that turns daily dedup
    * of a 100 TB corpus from O(corpus) per batch into O(batch). */
  def lshIndex(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
               maxBucketSize: Long = 1000): DataFrame =
    lshBanded(docs, idCol, textCol, shingleN, bands, rowsPerBand)
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")

  /** Incremental near-dup candidates for a NEW batch against a corpus
    * with a persisted [[lshIndex]]: signatures are computed for the
    * batch only; new-vs-old candidates come from joining the batch's
    * bands against the index, new-vs-new from the batch's own band
    * self-join. The corpus is never re-shingled and never shuffled —
    * with `broadcastNew` (default, for batches that fit in memory) the
    * index side streams through a broadcast hash join map-side.
    * Output: (id_a, id_b, est_jaccard, pair_type) with id_a < id_b and
    * pair_type ∈ {new_old, new_new}; a doc present in BOTH sides (a
    * re-ingest) yields its pair once, labeled new_old.
    *
    * Banding parameters MUST match the ones the index was built with —
    * signatures are positional. The batch side applies the same
    * `maxBucketSize` valve; index-side degenerate buckets were already
    * dropped at build time. */
  def incrementalPairs(index: DataFrame, newDocs: DataFrame,
                       idCol: String, textCol: String,
                       shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                       maxBucketSize: Long = 1000,
                       broadcastNew: Boolean = true): DataFrame =
    incrementalPairsBanded(index,
      lshIndex(newDocs, idCol, textCol, shingleN, bands, rowsPerBand,
        maxBucketSize),
      bands * rowsPerBand, broadcastNew)

  /** [[incrementalPairs]] over an ALREADY-banded batch (the exact frame
    * [[lshIndex]] produces). The streaming maintenance loop builds the
    * batch's band index once, persists it, and feeds it both here and
    * to the index append — calling the doc-level overload there ran the
    * CPU-heavy shingle+signature pipeline twice per micro-batch. */
  def incrementalPairsBanded(index: DataFrame, newBanded0: DataFrame,
                             numHashes: Int,
                             broadcastNew: Boolean = true): DataFrame = {
    val newBanded = if (broadcastNew) broadcast(newBanded0) else newBanded0

    val newOld = index.alias("o")
      .join(newBanded.alias("n"),
        col("o.band") === col("n.band") && col("o.bucket") === col("n.bucket") &&
        col("o.doc_id") =!= col("n.doc_id"))
      .select(col("o.doc_id").as("oid"), col("n.doc_id").as("nid"),
        col("o.sig").as("sig_o"), col("n.sig").as("sig_n"))
      .dropDuplicates("oid", "nid")
      .select(least(col("oid"), col("nid")).as("id_a"),
        greatest(col("oid"), col("nid")).as("id_b"),
        sigAgreement(col("sig_o"), col("sig_n"), numHashes).as("est_jaccard"),
        lit("new_old").as("pair_type"))

    val a = newBanded0.alias("a")
    val b = newBanded0.alias("b")
    val newNew = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        sigAgreement(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"),
        lit("new_new").as("pair_type"))

    // a re-ingested doc makes the same pair surface on both paths with
    // identical signatures — collapse deterministically to new_old
    // (= max: "new_old" > "new_new"), the label that tells the caller
    // the match is against the EXISTING corpus
    newOld.unionByName(newNew)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"),
        max(col("pair_type")).as("pair_type"))
  }

  /** The (doc_id, sig, band, bucket) stage shared by [[minhashLsh]] and
    * [[droppedLshBuckets]]. Each stage materializes its column before the
    * next references it — if the shingle array were inlined into all 16
    * hash transforms and again into every band expression, Catalyst's
    * project collapsing would recompute it ~100× per row (measured 10×
    * wall-clock blowup). The explicit repartition on the join key inserts
    * ONE exchange that ReuseExchange dedups across both sides of the
    * self-join — without it each side recomputes the full shingle+hash
    * signature pipeline (the same trick ngramJaccard uses on `shingle`). */
  private def lshBanded(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sh = flooredParallelism(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt")),
        "doc_id")
      .select(col("doc_id"), shingles(col("_txt"), shingleN).as("sh"))
      // a doc with fewer than n tokens has NO shingles and therefore no
      // MinHash signature (array_min over empty = all-NULL sig) — left
      // in, every such doc would share one constant hash(NULL-slice)
      // bucket per band, pairing unrelated short docs (and, en masse,
      // fabricating a phantom "cluster" for droppedLshBuckets). Shingle
      // similarity is undefined below n tokens; exact/embedding dedup
      // covers those docs.
      .filter(size(col("sh")) > 0)
    val sig = sh.select(col("doc_id"),
      minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
    pinnedWidth(sig.select(
      col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket")),
      col("band"), col("bucket"))
  }

  /** Audit of what [[minhashLsh]]'s cap skipped: one row per over-cap
    * (band, bucket) with its population. Run it when the cap is in
    * question — a non-empty result is the signal to [[exact]]-collapse
    * the corpus before LSH (a bucket only outgrows a sane cap when a
    * near-identical cluster of that size exists). */
  def droppedLshBuckets(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                        maxBucketSize: Long = 1000): DataFrame =
    lshBanded(docs, idCol, textCol, shingleN, bands, rowsPerBand)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucketSize)

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash from an array of token hashes (`array<long>`): per
    * bit, sum +1/-1 votes of each token hash's bit, sign → fingerprint
    * bit. Near-dups differ in few bits (hamming via bit_count of xor).
    * Delegates to the codegen'd graft.functions.SimHash64 expression —
    * one compiled pass over the array; the builtin-HOF formulation below
    * is kept as the semantic reference (OpsSpec asserts equality). */
  def simhashFromHashes(tokenHashes: Column): Column =
    graft.functions.SimHash64.simhash64(tokenHashes)

  /** 64 per-bit HOF folds (constant shift amounts generated Scala-side) —
    * the reference formulation for SimHash64. */
  def simhashFromHashesHof(tokenHashes: Column): Column =
    (0 until 64).map { bit =>
      when(aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << bit)) =!= 0L, 1L).otherwise(-1L)) > 0,
        lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Engine-portable 62-bit token hash: two independent polynomial
    * character folds (base 31 mod 1e9+7 in the low word, base 37 mod
    * 998244353 in the high word). Unlike seeded xxhash64 it is
    * reproducible in any SQL engine with a list fold, which is what lets
    * the DuckDB oracle recompute SimHash fingerprints independently.
    * Every intermediate stays below 2^35 — safe under ANSI overflow
    * checking. Bits 30-31 and 62-63 are always zero on both sides.
    * Delegates to the codegen'd [[graft.functions.PortableHash62]] — one
    * compiled pass fusing both folds; the builtin-HOF formulation below
    * is kept as the semantic reference (OpsSpec asserts equality). */
  def portableTokenHash(tok: Column): Column =
    graft.functions.PortableHash62.portableHash62(tok)

  /** Two `aggregate` HOF folds over per-character splits — the reference
    * formulation for [[portableTokenHash]]. Interpreted lambdas and a
    * one-char UTF8String allocation per code point make this ~an order of
    * magnitude slower than the compiled expression on token-dense text. */
  def portableTokenHashHof(tok: Column): Column = {
    def fold(base: Long, mod: Long): Column =
      aggregate(transform(split(tok, ""), ch => ascii(ch).cast("long")),
        lit(0L), (acc, c) => pmod(acc * base + c, lit(mod)))
    fold(31L, 1000000007L).bitwiseOR(shiftleft(fold(37L, 998244353L), 32))
  }

  /** Contiguous bit-chunk bounds for hamming-`k` candidate generation:
    * k+1 chunks over the 64-bit fingerprint (pigeonhole: ≤k differing
    * bits cannot touch all k+1 chunks, so some chunk is identical for
    * every true pair — the recall guarantee). */
  private[graft] def chunkBounds(maxHamming: Int): Seq[(Int, Int)] = {
    val n = maxHamming + 1
    require(n <= 32, s"maxHamming=$maxHamming needs $n chunks; >32 chunks of <2 bits bucket almost everything together — use a smaller threshold")
    (0 until n).map { i => (i * 64 / n, (i + 1) * 64 / n) }
  }

  /** (doc_id, fp) SimHash fingerprints of whitespace-distinct tokens.
    * Empty tokens (leading/trailing whitespace artifacts of the split)
    * are dropped before hashing — they carry no content and their hash
    * is the one value engines disagree on (`ascii('')` = 0 in Spark,
    * `ord('')` = -1 in DuckDB). */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
                          tokenHasher: Column => Column = xxhash64(_)): DataFrame =
    flooredParallelism(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).as("doc_id"),
        transform(
          filter(array_distinct(split(col(textCol), "\\s+")), t => length(t) > 0),
          tokenHasher).as("th"))
      .select(col("doc_id"), simhashFromHashes(col("th")).as("fp"))

  /** SimHash near-dup pairs within `maxHamming` bits. Candidate
    * generation buckets on `maxHamming + 1` contiguous fingerprint
    * chunks, so recall is guaranteed by pigeonhole for the requested
    * threshold (a fixed 4-chunk scheme only guarantees hamming ≤ 3) and
    * the join key is a small chunk, not O(n²). Chunk width shrinks as
    * the threshold grows — the candidate volume cost of a loose
    * threshold is explicit, not a silent recall hole. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    val fp = simhashFingerprints(docs, idCol, textCol, tokenHasher)
    val bounds = chunkBounds(maxHamming)
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array(bounds.zipWithIndex.map { case ((lo, hi), c) =>
        val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("fp"), lo).bitwiseAND(lit(mask)).as("ckey"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("fp"), col("cc.chunk"), col("cc.ckey"))
    // one exchange, reused by both self-join sides (see minhashLsh);
    // pinned width (r19) so AQE's byte-based coalescing doesn't
    // serialize the hamming pair join
    val chunkedP = pinnedWidth(chunked, col("chunk"), col("ckey"))
    val a = chunkedP.alias("a")
    val b = chunkedP.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        call_function("bit_count", col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ----------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard similarity for candidate pairs via an inverted
    * shingle index: explode distinct shingles, self-join on shingle,
    * count common shingles per pair, Jaccard = |∩| / (|A|+|B|-|∩|).
    * The shingle join is the classic scalable formulation (no O(n²) doc
    * cross join); skew on ultra-common shingles is the known hazard —
    * `maxDocFreq` drops shingles appearing in more than that many docs
    * (stopword-shingle suppression), which both bounds skew and is
    * standard practice at corpus scale. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minJaccard: Double = 0.8,
                   maxDocFreq: Long = 1000): DataFrame = {
    // Per-doc shingle counts are the ARRAY SIZE, computed row-wise before
    // the explode and carried through the pair join as a payload column —
    // not a separate doc_id aggregate joined back per side (round 2's
    // shape: a sizes aggregate plus TWO equi-joins, each a shuffle once
    // the corpus outgrows broadcast). The exploded shingle set then feeds
    // three subplans (doc-frequency and both sides of the pair join); the
    // explicit repartition on `shingle` MATERIALIZES the explode as one
    // shuffle stage that the stage cache serves to all three consumers,
    // so the CPU-heavy shingling runs once — measured when introduced in
    // round 3 (7.9 → 3.0 s at sf0.1, with the carried n_sh). The cost is
    // one exchange of the exploded index, cheap next to re-shingling the
    // corpus per consumer.
    val sh = flooredParallelism(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt")),
        "doc_id")
      .select(col("doc_id"), shingles(col("_txt"), n).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n_sh"),
        explode(col("shs")).as("shingle"))
    // pinnedWidth (r19): AQE coalesced this exchange to ~10 tasks by
    // bytes while the pair join above it carries the operator's CPU
    val shP = pinnedWidth(sh, col("shingle"))
    // document frequency as a WINDOW over the one shingle exchange
    // (r19): the original groupBy+join-back stopped sharing the
    // exchange once column pruning dropped (doc_id, n_sh) under the
    // aggregate branch — non-identical exchange children defeat
    // ReuseExchange, so the CPU-heavy shingle explode ran TWICE
    // (QueryProbe on x_curation_pipeline: two ~10 s-cpuSum explode
    // stages). The window's required distribution is satisfied by the
    // repartition: one explode pass, one exchange, no join; a window
    // partition is one shingle's postings — the same rows the join's
    // build side held, so the memory bound is unchanged.
    // EAGER checkpoint (r19): both self-join sides consume `filtered`,
    // and above the shared exchange each side re-executed the window's
    // per-partition sort + count (QueryProbe on x_triplets: a 41 s-cpuSum
    // join stage, ~half of it the duplicated window). Materialized once,
    // the join sides read blocks; storage is the posting list the
    // exchange already held (MEMORY_AND_DISK, spills at scale).
    val filtered = shP
      .withColumn("df", count(lit(1))
        .over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDocFreq)
      .select("doc_id", "n_sh", "shingle")
      .localCheckpoint(true)
    val a = filtered.alias("a")
    val b = filtered.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      // n_sh is constant within a doc, so min() just carries it
      .agg(count(lit(1)).as("common"),
        min(col("a.n_sh")).as("n_a"), min(col("b.n_sh")).as("n_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** Benchmark decontamination: which training documents overlap an
    * evaluation/benchmark set? For every (corpus doc, benchmark doc) pair
    * sharing word n-grams, emits the shared count and the fraction of the
    * BENCHMARK doc's shingles found in the corpus doc (the asymmetric
    * direction that matters for leakage — a benchmark item fully
    * contained in a large training doc is contamination even though the
    * training doc's own fraction is tiny). Same inverted-index shape as
    * [[ngramJaccard]]: both sides explode to (id, n_sh, shingle), join on
    * the shingle, aggregate per pair — shuffles shingles and ids, never
    * documents; `maxDocFreq` (applied to the CORPUS side's document
    * frequency) drops stopword shingles, bounding skew. */
  def crossContamination(corpus: DataFrame, corpusId: String, corpusText: String,
                         bench: DataFrame, benchId: String, benchText: String,
                         n: Int = 3, minOverlap: Double = 0.5,
                         maxDocFreq: Long = 1000): DataFrame = {
    def side(df: DataFrame, id: String, text: String, pfx: String) =
      flooredParallelism(df.select(col(id).as(s"${pfx}_id"),
          col(text).as("_txt")), s"${pfx}_id")
        .select(col(s"${pfx}_id"), shingles(col("_txt"), n).as("shs"))
        .select(col(s"${pfx}_id"), size(col("shs")).as(s"${pfx}_n_sh"),
          explode(col("shs")).as("shingle"))
    val c = pinnedWidth(side(corpus, corpusId, corpusText, "corpus"),
      col("shingle"))
    // corpus-side document frequency as a window over the one shingle
    // exchange — the ngramJaccard r19 fix (pruning under the aggregate
    // branch forked the exchange and re-ran the corpus shingling)
    val cKept = c
      .withColumn("df", count(lit(1))
        .over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDocFreq)
      .select(col("corpus_id"), col("corpus_n_sh"), col("shingle"))
    side(bench, benchId, benchText, "bench")
      .join(cKept, Seq("shingle"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("common"), min(col("bench_n_sh")).as("bench_n_sh"))
      .withColumn("bench_overlap",
        col("common").cast("double") / col("bench_n_sh"))
      .filter(col("bench_overlap") >= minOverlap)
      .select("corpus_id", "bench_id", "common", "bench_overlap")
  }

  // ------------------------------------------ components / canonical keep

  /** Connected components over near-dup pairs: every doc in a duplicate
    * cluster gets the cluster's minimum doc id as `comp`. This is the
    * step that turns PAIRS into a deduplicated corpus — transitive
    * near-dups (a~b, b~c) must collapse to one cluster even when (a,c)
    * was never emitted as a pair.
    *
    * Algorithm: alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) as a pure DataFrame loop — each round is two
    * aggregations over the edge list, and the edge set contracts toward
    * star graphs centered on each component's minimum id in O(log n)
    * rounds even on adversarial path graphs (min-label propagation and
    * Pregel CC both need O(diameter) rounds there). Replaced the GraphX
    * Pregel version in round 5: identical labels (OpsSpec cross-checks
    * against [[componentsGraphx]] on chains/cliques/forests) at parity
    * wall-clock on the bench corpus's pair graphs (CcProbe: 1.45 s vs
    * 1.52 s at sf0.1), without GraphX's RDD/vertex-cut materialization
    * or its session-lifetime cached-graph leak, and with the stronger
    * round bound when a pathological pair graph shows up. Each round
    * checkpoints only the contracted edge list (compact: two longs).
    *
    * Ids must be numeric (labels are computed on Long; a non-numeric id
    * casts to null and fails the edge build). For string ids, derive a
    * surrogate first — e.g. `xxhash64(id)` — and join the labels back. */
  def components(pairs: DataFrame, idA: String = "id_a",
                 idB: String = "id_b"): DataFrame = {
    // ONE checkpointed canonical projection feeds both the node set and
    // the edge loop — `pairs` usually carries an expensive generation
    // pipeline (an LSH or inverted-index self-join), and deriving nodes
    // and edges from it independently would execute that pipeline twice
    // (measured: it doubled x_dedup_components end-to-end).
    // Each round then ends in an EAGER localCheckpoint: the round's
    // result is materialized and — critically — its LOGICAL plan is
    // truncated to the checkpointed blocks. A persist() alone caches
    // runtime blocks but leaves the logical plan growing by one round's
    // operators per iteration, so analysis/optimization/AQE cost
    // compounds with the iteration count (the classic
    // iterative-DataFrame pitfall). Blocks are freed when the superseded
    // frame is GC'd; at cluster scale with flaky executors swap for
    // reliable `checkpoint()` under setCheckpointDir — the same trade
    // GraphX Pregel exposes via its checkpoint interval.
    val base = pairs
      .select(greatest(col(idA).cast("long"), col(idB).cast("long")).as("u"),
        least(col(idA).cast("long"), col(idB).cast("long")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val nodes = base.select(explode(array(col("u"), col("v"))).as("id")).distinct()
    // one alternating large-star/small-star contraction round.
    // large-star: from each node u, hang every LARGER neighbor off the
    // minimum of u's closed neighborhood. Processing the symmetrized
    // edge list keeps every undirected edge represented (emitted from
    // its smaller endpoint) while strictly-smaller neighbors contract.
    // No dedup before the windows: duplicates don't multiply within a
    // round, and the small-star distinct collapses them one shuffle
    // later. small-star: orient edges large→small; hang u and all its
    // smaller neighbors off the minimum neighbor. (v,m) with v==m
    // self-loops drop; (u,m) never does (m < u by construction).
    def starRound(es: DataFrame): DataFrame = {
      val sym = es.select(col("u"), col("v"))
        .union(es.select(col("v").as("u"), col("u").as("v")))
      val large = sym
        .withColumn("m", min(least(col("v"), col("u")))
          .over(Window.partitionBy("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      large
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .withColumn("m", min(col("v")).over(Window.partitionBy("u")))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    var edges = base.filter(col("u") =!= col("v"))
    var prevCnt = edges.count()
    var converged = prevCnt == 0L
    // The contraction loop is FIXED-OVERHEAD-bound, not data-bound
    // (r19 QueryProbe: ~43 sub-110 ms jobs dominate x_winnow_dedup —
    // under AQE every one of the ~3 shuffles per round is its own
    // ~100 ms stage-job plus driver re-planning); see
    // [[graft.ops.withLoopConf]]. OpsSpec pins label equality against
    // GraphX on structured and random graphs either way.
    withLoopConf(pairs.sparkSession, prevCnt) {
      while (!converged) {
        // ONE star round per checkpoint/count cycle: near-dup pair
        // graphs are cliques-with-fringe and converge in 1-2 rounds
        // (CcProbe at sf0.1: 256 edges, converged after round 2), so
        // batching two rounds per cycle — tried first in r19 — ran
        // twice the star-round work for the same convergence and
        // measured net slower; the AQE-off/adaptive-partition knobs
        // above are what actually cut the per-round fixed cost.
        val small = starRound(edges).localCheckpoint(true)
        val cnt = small.count()
        // Fixpoint: the edge set is stable. Counts match every round
        // near convergence, so the (shuffle-cheap, contracted-edges-
        // only) exact set comparison runs only then — no
        // hash-checksum leap of faith.
        converged = cnt == prevCnt && small.exceptAll(edges).isEmpty
        edges = small
        prevCnt = cnt
      }
    }
    // At fixpoint the edges form stars (node → component-minimum root);
    // roots and isolated nodes label themselves. `edges` is already a
    // checkpoint root, so the returned plan is one join deep — callers
    // never replay the iterative DAG.
    nodes.join(edges, nodes("id") === edges("u"), "left")
      .select(col("id").as("doc_id"), coalesce(col("v"), col("id")).as("comp"))
  }

  /** GraphX Pregel connected components — the pre-round-5 implementation,
    * kept ONLY as the independent semantic reference for [[components]]
    * (OpsSpec asserts label equality on structured and random graphs).
    * NOT a performance path: the RDD round-trip forfeits Tungsten and
    * whole-stage codegen, and it benched 4-5× slower than the
    * alternating-star DataFrame loop — never benchmark or ship this. */
  private[graft] def componentsGraphx(pairs: DataFrame, idA: String = "id_a",
                                      idB: String = "id_b"): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = pairs.sparkSession
    val edges = pairs.select(col(idA).cast("long"), col(idB).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val cc = Graph.fromEdges(edges, ()).connectedComponents().vertices
    spark.createDataFrame(cc).toDF("doc_id", "comp")
  }

  /** Deduplicated corpus: keep one canonical doc (minimum id) per
    * near-dup component; docs that appear in no pair survive untouched.
    * The anti-join ships only the (id) drop-list, never document
    * payloads. */
  def dedupCorpus(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = components(pairs)
      .filter(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Quality-aware deduplicated corpus: within each near-dup component
    * keep the member ranked FIRST by `quality` (descending, id
    * ascending on ties) — "longest document wins" and its cousins —
    * instead of [[dedupCorpus]]'s arbitrary minimum id. Training-data
    * pipelines prefer this form: duplicate clusters usually contain one
    * full document plus truncated or boilerplate-wrapped copies, and
    * min-id keeps a random one.
    *
    * Same shuffle shape as [[dedupCorpus]] plus one window over the
    * component id: component membership (ids only) joins back to the
    * docs just to read the quality column, the rank rides a window
    * partitioned by component (components are near-dup clusters —
    * small by construction; the hot-key cap in the pair generators
    * bounds them), and the anti-join ships only dropped ids. */
  def dedupCorpusBy(docs: DataFrame, idCol: String, pairs: DataFrame,
                    quality: Column): DataFrame = {
    val members = components(pairs)
      .join(docs.select(col(idCol).as("doc_id"), quality.as("_q")), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp")).orderBy(col("_q").desc, col("doc_id").asc)
    val drop = members
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .select(col("doc_id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-dup: pairs with cosine ≥ `minCos`. Candidates come
    * from Similarity.lshBuckets (random-hyperplane LSH) so the pair join
    * is bucket-local; exact cosine is then computed on candidates only.
    * `maxBucketSize` is the same degenerate-cluster safety valve as
    * [[minhashLsh]]'s: an embedding cluster of n near-identical vectors
    * shares one hyperplane bucket and would hand one reducer n²/2 cosine
    * evaluations — over-cap buckets sit out, and the population count
    * rides the bucket exchange the self-join already needs. */
  def embeddingNearDup(embs: DataFrame, idCol: String, vecCol: String,
                       minCos: Double = 0.95, planes: Int = 12,
                       dim: Int = 64, maxBucketSize: Long = 10000): DataFrame = {
    // Norms are materialized per vector BEFORE the pair join — computing
    // cosine() pairwise would re-derive both norms for every candidate
    // pair (3× the vector passes, measured ~3× wall-clock).
    val bucketed0 = Similarity.withLshBucket(embs, vecCol, planes, dim)
      .select(col(idCol).as("vid"), col(vecCol).as("v"), col("lsh_bucket"))
      .withColumn("nrm", Similarity.norm(col("v")))
    // pinned width (r19): the cosine pair join is the compute
    val bucketed = pinnedWidth(bucketed0, col("lsh_bucket"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("lsh_bucket")))
      .filter(col("bsz") <= maxBucketSize)
      .drop("bsz")
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.lsh_bucket") === col("b.lsh_bucket") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        (Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Cross-source near-duplicate overlap matrix — the mixture-design
    * view of [[ngramJaccard]]: which sources scrape the same content?
    * A corpus mixer weighting sources independently double-counts
    * whatever they share; this aggregates the near-dup pairs up to
    * unordered (source, source) cells so a datasheet (x_data_card) can
    * show overlap mass and a mixture can discount it. Diagonal cells
    * (source_a = source_b) are within-source duplication.
    *
    * Per-pair similarity contributes floor(jaccard·10⁶) — one exact
    * IEEE division of int64s then a floor, summed as int64 — so the
    * cell totals are order-insensitive and oracle-replayable.
    * Scale shape: the pair set is the operator's output (bounded by
    * minJaccard/maxDocFreq, orders smaller than the corpus); the two
    * id→source joins shuffle only (id, source) pairs. */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, n: Int = 3, minJaccard: Double = 0.1,
                    maxDocFreq: Long = 1000): DataFrame = {
    val pairs = ngramJaccard(docs, idCol, textCol, n, minJaccard, maxDocFreq)
    val src = docs.select(col(idCol).as("_sid"), col(srcCol).as("_src"))
    pairs
      .join(src.select(col("_sid").as("id_a"), col("_src").as("_src_a")),
        Seq("id_a"))
      .join(src.select(col("_sid").as("id_b"), col("_src").as("_src_b")),
        Seq("id_b"))
      .select(
        least(col("_src_a"), col("_src_b")).as("source_a"),
        greatest(col("_src_a"), col("_src_b")).as("source_b"),
        floor(col("jaccard") * 1000000.0d).cast("long").as("_j_e6"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_j_e6")).as("sum_jaccard_e6"))
  }
}
