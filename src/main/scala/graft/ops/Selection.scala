package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash62.portableHash62

/** Target-distribution data selection for pretraining corpora — the
  * DSIR shape (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): score every raw document by
  * how target-like its hashed n-gram feature distribution is, where
  * "target-like" is the per-feature ratio of target to raw counts over
  * a fixed hashed-feature space. The paper's log-likelihood-ratio
  * importance weight is replaced by the exact integer rational form
  * this engine uses everywhere floats would break oracle replay (the
  * Gini/decayed-sum precedent): per-bucket ratio
  * `r_b = (tgt_b + 1) * scale DIV (raw_b + 1)` (+1 Laplace smoothing on
  * both counts), per-document score the mean of its gram occurrences'
  * ratios, `score = sum(r) DIV n_grams`. The global
  * rawTotal/targetTotal normalizer multiplies every bucket by the same
  * constant, so it is rank-preserving and omitted — scores order
  * documents exactly as the normalized arithmetic-mean importance
  * would.
  *
  * Plan shape for 100 TB: the (doc, gram) explode is ONE shuffle-free
  * projection (tokens let-bound once — the interpreted-HOF pitfall
  * documented at [[TextAnalysis.winnow]]); the feature table is
  * aggregated to AT MOST `buckets` rows (hashed feature space is fixed,
  * independent of corpus size) and broadcast back onto the exploded
  * grams — never a shuffle join against the corpus; the per-document
  * mean is the one data-sized aggregation, carrying a single long per
  * gram. Overflow headroom: a bucket's count at 10^13 grams over 2^12
  * buckets is ~2.4e9; times scale 1e6 stays < 2^63.
  */
object Selection {

  /** Per-document DSIR importance scores of `docs` against the target
    * subset marked by boolean column `isTarget` (the target
    * distribution is ESTIMATED FROM the same frame — pass e.g.
    * `col("lang") === "en"` to up-weight documents n-gram-similar to
    * the English slice). Features are hashed word `n`-grams folded into
    * `buckets` buckets by the engine-portable 62-bit hash (non-negative,
    * so plain `%` agrees across engines). Documents with fewer than `n`
    * tokens have no features and are omitted (no evidence either way —
    * the caller's keep/drop policy decides their fate explicitly).
    *
    * Output: (doc_id, n_grams, score_e6) — deterministic exact int64,
    * replayable in ANSI SQL by rebuilding bucket counts with the same
    * hash. Selection on top is a threshold or a weighted sample
    * ([[Splits]]); the score column is the operator. */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, n: Int = 2, buckets: Int = 1024,
                 scale: Long = 1000000L): DataFrame = {
    require(n >= 1 && buckets >= 1 && scale >= 1,
      s"n, buckets, scale must be positive, got n=$n buckets=$buckets scale=$scale")
    // let toks = split(text) ONCE (single-element transform binding);
    // sub-n docs filtered before `sequence` could run backwards
    val grams = element_at(
      transform(array(split(col(textCol), " ")), toks =>
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))), 1)
    val g = docs
      .select(col(idCol).as("doc_id"), isTarget.cast("boolean").as("_tgt"),
        col(textCol))
      .filter(size(split(col(textCol), " ")) >= n)
      .select(col("doc_id"), col("_tgt"), explode(grams).as("gram"))
      .select(col("doc_id"), col("_tgt"),
        (portableHash62(col("gram")) % buckets).as("bucket"))
    // hashed-feature table: bounded by `buckets` regardless of corpus
    // size — the broadcast is a design invariant, not a size guess
    val ratios = g.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_raw"),
        count(when(col("_tgt"), lit(1))).as("_tgtc"))
      .select(col("bucket"),
        intDiv((col("_tgtc") + 1L) * scale, col("_raw") + 1L).as("_r"))
    g.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("_r")).as("_sum"))
      .select(col("doc_id"), col("n_grams"),
        intDiv(col("_sum"), col("n_grams")).as("score_e6"))
  }

  /** Deterministic per-epoch global training order — the reproducible
    * corpus shuffle a multi-epoch pretraining run needs (each epoch a
    * different but seed-fixed permutation, identical on every re-run
    * and on any cluster size): for each epoch `e`, documents are
    * ordered by the portable hash of `"{seed}{e}:{id}"` (doc_id
    * tie-break), assigned a contiguous 0-based index within the epoch,
    * and batched by `idx DIV batchSize`.
    *
    * The within-epoch index is the two-phase distributed prefix rank
    * ([[Packing.withGlobalRank]] over (epoch, hash, id) — never a
    * single-task global window); subtracting `(epoch-1) * corpusSize`
    * converts the global tape position to the per-epoch index, with the
    * corpus size carried IN-PLAN as a broadcast 1-row aggregate (the
    * x_assoc_rules pattern — no driver collect). Batches never straddle
    * epochs by construction. */
  private def mix62(h: Column): Column =
    graft.functions.PortableHash62.mix62(h)

  def epochOrder(docs: DataFrame, idCol: String, epochs: Int,
                 batchSize: Long, seed: String = "ep",
                 numPartitions: Int = 64): DataFrame = {
    require(epochs >= 1 && batchSize >= 1,
      s"epochs and batchSize must be positive, got $epochs/$batchSize")
    val ids = docs.select(col(idCol).as("doc_id"))
    val nDocs = ids.agg(count(lit(1)).as("_n"))
    val tape = ids
      .select(col("doc_id"),
        explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("_h", mix62(portableHash62(
        concat(lit(seed), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")))))
    Packing.withGlobalRank(tape, Seq("epoch", "_h", "doc_id"), "_gr",
        numPartitions)
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("epoch").cast("long").as("epoch"),
        (col("_gr") - 1L - (col("epoch") - 1L) * col("_n")).as("idx"))
      .withColumn("batch", intDiv(col("idx"), lit(batchSize)))
  }

  /** Curriculum-ordered training tape (Bengio et al., "Curriculum
    * Learning", ICML 2009; the length-staged variant is sequence-length
    * warmup à la Press et al. 2021): documents ordered by an ascending
    * caller-defined difficulty `phase` (length tier, quality decile,
    * noise score — any deterministic integer), SHUFFLED WITHIN each
    * phase by the seeded mixed hash, and batched by the global 0-based
    * tape index. One tape, so consecutive batches walk easy → hard;
    * a batch may straddle a phase boundary (the tape is one training
    * run, not per-phase datasets — split on `phase` for those).
    *
    * Same scale shape as [[epochOrder]]: the order is the two-phase
    * distributed prefix rank over (phase, hash, id) — never a one-task
    * global window. */
  def curriculumOrder(docs: DataFrame, idCol: String, phase: Column,
                      batchSize: Long, seed: String = "cu",
                      numPartitions: Int = 64): DataFrame = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val tape = docs
      .select(col(idCol).as("doc_id"), phase.cast("long").as("phase"))
      .withColumn("_h", mix62(portableHash62(
        concat(lit(s"$seed:"), col("doc_id").cast("string")))))
    Packing.withGlobalRank(tape, Seq("phase", "_h", "doc_id"), "_gr",
        numPartitions)
      .select(col("doc_id"), col("phase"), (col("_gr") - 1L).as("idx"))
      .withColumn("batch", intDiv(col("idx"), lit(batchSize)))
  }

  /** Per-group 1-based rank over `orderCols` WITHOUT a per-group
    * single-task sort: a `row_number() OVER (PARTITION BY grp ORDER BY
    * …)` puts each group in ONE sort partition, so the biggest group
    * (the dominant language of a 100 TB corpus) becomes the straggler.
    * Instead the GLOBAL two-phase prefix rank runs over
    * (grpCols ++ orderCols) — range-partitioned, no single task — and
    * each group's local rank is recovered as
    * `global_rank − min(global_rank in group) + 1`; the per-group bases
    * are a #groups-row aggregate broadcast back. Exactly equal to the
    * window form (SelectionSpec pins it), cheaper by the group-sort.
    *
    * `grpCols ++ orderCols` must be a total order (unique tie-breaker
    * included); group cardinality must be broadcastable (languages,
    * sources — not user ids). */
  def groupedRank(df: DataFrame, grpCols: Seq[String],
                  orderCols: Seq[String], outCol: String = "rank",
                  numPartitions: Int = 64): DataFrame = {
    val ranked = Packing.withGlobalRank(df, grpCols ++ orderCols, "_grank",
      numPartitions)
    val bases = ranked.groupBy(grpCols.map(col): _*)
      .agg(min(col("_grank")).as("_gbase"))
    ranked.join(broadcast(bases), grpCols)
      .withColumn(outCol, col("_grank") - col("_gbase") + 1L)
      .drop("_grank", "_gbase")
  }

  /** Per-group SQL `ntile(k)` in closed form over the distributed
    * [[groupedRank]] — same scale argument, same tie discipline, and
    * bit-equal to the window `ntile` the oracle replays: with group
    * size n, q = n DIV k, r = n MOD k, the first r buckets take q+1
    * rows and the rest q (bigger buckets first, exactly the SQL
    * spec), so
    * `bucket = (rank−1) DIV (q+1) + 1`            for rank ≤ r·(q+1)
    * `bucket = r + (rank − r·(q+1) − 1) DIV q + 1` otherwise
    * (the q = 0 case — fewer rows than buckets — falls entirely into
    * the first branch: every row its own bucket). */
  def groupedNtile(df: DataFrame, grpCols: Seq[String],
                   orderCols: Seq[String], k: Int,
                   outCol: String = "bucket_no",
                   numPartitions: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val ranked = groupedRank(df, grpCols, orderCols, "_rk", numPartitions)
    val sizes = ranked.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val q = intDiv(col("_n"), lit(k.toLong))
    val r = col("_n") % k
    ranked.join(broadcast(sizes), grpCols)
      .withColumn(outCol,
        when(col("_rk") <= r * (q + 1L),
          intDiv(col("_rk") - 1L, q + 1L) + 1L)
          .otherwise(r + intDiv(col("_rk") - r * (q + 1L) - 1L, q) + 1L)
          .cast("int"))
      .drop("_rk", "_n")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * LREC 2020): each document scored by the corpus-unigram negative
    * log-likelihood ([[TextAnalysis.unigramLogProb]] — the cheap
    * stand-in for CCNet's KenLM perplexity), then split per language
    * into equal-count head / middle / tail thirds (most → least
    * fluent). CCNet trains on head+middle and drops tail; emitting the
    * label keeps that policy (and any re-cut) downstream.
    *
    * The per-language thirds are [[groupedNtile]] over
    * (nll_e4, doc_id) — no per-language single-task sort, ties broken
    * deterministically. Documents with no tokens have no score and no
    * bucket (omitted, as in unigramLogProb). Output: (doc_id, <grp>,
    * n_toks, nll_e4, bucket ∈ head|middle|tail). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        grpCol: String, alpha: Double = 0.5,
                        numPartitions: Int = 64): DataFrame = {
    // pin the SCORED frame (one row per doc — O(#docs), the same weight
    // class as the prefix-sum's own internal checkpoint) before the
    // rank: the range partitioner's boundary-sampling pass would
    // otherwise re-execute the whole unigram pipeline a second time
    // (measured 2× at sf0.1 — tools/CcnetProbe)
    val lm = TextAnalysis.unigramLogProb(docs, idCol, textCol, alpha)
      .join(docs.select(col(idCol).as("doc_id"), col(grpCol)), Seq("doc_id"))
      .localCheckpoint(true)
    groupedNtile(lm, Seq(grpCol), Seq("nll_e4", "doc_id"), 3, "_b",
        numPartitions)
      .withColumn("bucket",
        when(col("_b") === 1, "head")
          .when(col("_b") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col(grpCol), col("n_toks"), col("nll_e4"),
        col("bucket"))
  }
}
