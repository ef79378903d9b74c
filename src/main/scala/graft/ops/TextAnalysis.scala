package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, n-gram-heuristic language ID, and document fingerprinting.
  * Everything is built from codegen'd builtin functions (no UDFs) so the
  * expressions inline into whole-stage codegen over a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace token count, robust to empty strings. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword-unit count: runs of letters, runs of digits, and
    * single other non-space chars — the classic pre-tokenizer regex. */
  def regexTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long")

  /** Occurrence count of a literal word (length-delta trick — avoids a
    * regex scan and stays identical across engines). */
  def occurrences(text: Column, word: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(word), "")))
      / word.length).cast("long")

  /** Quality-scoring signals: lengths, token stats, punctuation ratio,
    * stopword ratio. `stopwords` defaults to a tiny English list.
    * Stopwords are counted by whole-token equality over the whitespace
    * tokenization (a regex-split length-delta undercounts adjacent
    * occurrences and text-final stopwords — token equality is both the
    * intended semantics and engine-portable). */
  def qualitySignals(docs: DataFrame, textCol: String,
                     stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val stopHits = size(filter(split(trim(t), "\\s+"),
      x => stopwords.map(w => x === w).reduce(_ || _)))
    docs
      .withColumn("n_chars_sig", length(t).cast("long"))
      .withColumn("n_tokens", toks)
      .withColumn("mean_token_len",
        when(toks > 0, (length(regexp_replace(t, "\\s+", "")).cast("double") / toks))
          .otherwise(lit(0.0)))
      .withColumn("punct_cnt",
        (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("long"))
      .withColumn("stopword_cnt", stopHits.cast("long"))
  }

  /** Repetition / lexical-diversity signals — the Gopher-style quality
    * rules that catch degenerate generated or boilerplate text: the
    * fraction of tokens taken by the single most common term
    * (`top_ratio`) and the type-token ratio (`ttr` = distinct/total).
    * One explode + two aggregations, both map-side combined; ratios are
    * floor-scaled int64 of a single int/int division, so they replay
    * identically in any engine. Docs with no tokens produce no row. */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    Relevance.termCounts(docs, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("tf")).as("max_tf"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("max_tf"),
        floor(col("max_tf").cast("double") / col("n_tokens") * lit(1e6))
          .cast("long").as("top_ratio_e6"),
        floor(col("n_distinct").cast("double") / col("n_tokens") * lit(1e6))
          .cast("long").as("ttr_e6"))

  /** n-gram-heuristic language ID: score each candidate language by
    * marker-word hits, pick the argmax (ties broken by language-list
    * order, matching a greatest/CASE chain in SQL). Returns the input
    * plus `lang_guess`. */
  def languageId(docs: DataFrame, textCol: String,
                 markers: Seq[(String, Seq[String])] = DefaultMarkers): DataFrame = {
    val scores: Seq[(String, Column)] = markers.map { case (lang, words) =>
      lang -> words.map(w => occurrences(col(textCol), w)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val guess = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      coalesce(acc, when(s === best && best > 0, lit(lang)))
    }
    docs.withColumn("lang_guess", coalesce(guess, lit("und")))
  }

  val DefaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "que"),
    "de" -> Seq("der", "und", "die"),
    "zh" -> Seq("的", "是", "在"))

  /** Polynomial rolling-hash fingerprint of the whole document: base-31
    * over character codes, mod 1e9+7 — a cheap order-sensitive content
    * id, unlike the order-insensitive md5 of Dedup.exact. Modular (not
    * wrapping) arithmetic keeps every intermediate below 2^35, so it runs
    * clean under ANSI overflow checking. Codegen'd fold over the
    * character array. */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))

  /** Corpus-wide repeated exact n-grams — the memorization-risk /
    * boilerplate diagnostic of training-data curation (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022, motivates exactly this view: verbatim sequences repeated
    * across documents are what models memorize): every n-token gram
    * occurring in at least `minDocs` DISTINCT documents, with its
    * document frequency and total occurrence count. Complements the
    * pairwise ops — ngramJaccard/winnowPairs say which DOC PAIRS
    * overlap; this says which SEQUENCES recur, feeding dedup-policy
    * tuning (what to cut) rather than pair detection.
    *
    * Plan shape for 100 TB: gram extraction is one shuffle-free
    * projection (tokens let-bound once — the interpreted-HOF
    * re-evaluation pitfall documented at [[winnow]]); the single
    * shuffle carries (gram, doc_id) into one hash aggregation whose
    * distinct-count rides the same exchange (partial aggregation
    * map-side). The output is the gram table itself — bounded by the
    * `minDocs` filter, no driver materialization. */
  /** (doc_id, gram) explode of every n-token gram — the shared front of
    * the repeated-ngram family. One shuffle-free projection; tokens are
    * let-bound once (the interpreted-HOF pitfall documented at
    * [[winnow]]); sub-n docs are filtered before `sequence` can run
    * backwards. */
  private def gramExplode(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val grams = element_at(
      transform(array(split(col(textCol), " ")), toks =>
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))), 1)
    flooredParallelism(docs.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id")
      .filter(size(split(col(textCol), " ")) >= n)
      .select(col("doc_id"), explode(grams).as("gram"))
  }

  def repeatedNgrams(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 1, s"n and minDocs must be positive")
    gramExplode(docs, idCol, textCol, n)
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** ROUGE-N overlap metrics (Lin, "ROUGE: A Package for Automatic
    * Evaluation of Summaries", ACL 2004 WS) for given document pairs:
    * clipped word-n-gram overlap between a reference (`id_a`) and a
    * candidate (`id_b`), reported as precision/recall/F1. The classic
    * summarization-eval metric doubles as a near-dup *explanation*
    * signal in curation: jaccard says THAT two docs overlap, ROUGE's
    * clipped counts say how much of each side is covered.
    *
    * All outputs are exact integers: overlap is a clipped-multiset sum
    * (Σ min(count_ref, count_cand) per gram), the gram totals are
    * row-wise token arithmetic, and P/R/F1 are e4 fixed-point integer
    * divisions — with P = ov/n_cand and R = ov/n_ref, F1 reduces to
    * 2·ov/(n_ref+n_cand), so no float touches the result and a SQL
    * oracle replays it term by term.
    *
    * Scale shape: per-doc gram counts are one hash aggregation; the
    * overlap is `pairs ⋈ grams(ref) ⋈ grams(cand)` — work
    * O(Σ_pairs |grams(ref)|), ROUGE's own cost, NEVER all-pairs (the
    * caller supplies the pair list, pre-blocked by LSH/jaccard/linkage).
    * Pairs whose sides share no gram still emit a row (zero scores):
    * an eval metric that silently drops pairs misreports the corpus. */
  def rougeN(docs: DataFrame, idCol: String, textCol: String,
             pairs: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // each of these frames feeds TWO consumers below (the ref and cand
    // sides / the overlap and final joins) — lazy, every consumer
    // re-ran the gram explode, the token count, and the caller's whole
    // pair-generation pipeline (the x_rouge final plan carried 24
    // document scans); one eager checkpoint each (r18 opt)
    val cnt = gramExplode(docs, idCol, textCol, n)
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = docs.select(col(idCol).as("doc_id"),
      greatest(size(split(col(textCol), " ")) - lit(n) + 1, lit(0))
        .cast("long").as("ng"))
      .localCheckpoint(true)
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val ov = p
      .join(cnt.select(col("doc_id").as("id_a"), col("gram"),
        col("c").as("ca")), Seq("id_a"))
      .join(cnt.select(col("doc_id").as("id_b"), col("gram"),
        col("c").as("cb")), Seq("id_b", "gram"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("overlap"))
    p.join(ov, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("overlap"))
      .join(tot.select(col("doc_id").as("id_a"), col("ng").as("n_ref")),
        Seq("id_a"))
      .join(tot.select(col("doc_id").as("id_b"), col("ng").as("n_cand")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("overlap"),
        col("n_ref"), col("n_cand"),
        when(col("n_cand") > 0,
          intDiv(col("overlap") * 10000L, col("n_cand")))
          .otherwise(0L).as("rouge_p_e4"),
        when(col("n_ref") > 0,
          intDiv(col("overlap") * 10000L, col("n_ref")))
          .otherwise(0L).as("rouge_r_e4"),
        when(col("n_ref") + col("n_cand") > 0,
          intDiv(col("overlap") * 20000L, col("n_ref") + col("n_cand")))
          .otherwise(0L).as("rouge_f1_e4"))
  }

  /** Per-batch PARTIAL of the corpus gram table, for incrementally
    * maintained repeated-ngram state under the append-only ingest
    * contract (each doc_id arrives in exactly one batch — the same
    * contract the incremental LSH index relies on): per-gram distinct
    * docs and occurrences WITHIN the batch. Both fields are then
    * additive across batches, so maintenance is O(|batch|) and the
    * corpus is never re-exploded. Deliberately UNFILTERED: a gram seen
    * once per batch can cross `minDocs` only at merge time — filtering
    * partials is the classic incremental-aggregation bug, and the
    * oracle equality of the composed query exists to catch it. */
  def repeatedNgramsPartial(batch: DataFrame, idCol: String, textCol: String,
                            n: Int = 5): DataFrame =
    gramExplode(batch, idCol, textCol, n)
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))

  /** Merge any set of [[repeatedNgramsPartial]] states to the exact
    * corpus table [[repeatedNgrams]] would compute over the batches'
    * union, then apply `minDocs`. States are orders of magnitude
    * smaller than the exploded grams; merge order cannot change the
    * result (sums of per-batch-disjoint doc counts). */
  def repeatedNgramsMerge(states: DataFrame, minDocs: Int = 2): DataFrame =
    states.groupBy(col("gram"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_occ")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** Positional variant of [[gramExplode]]: (doc_id, pos, gram) with
    * `pos` the 0-based token index the gram starts at — the front of
    * span-level dedup, where WHERE a duplicate sits matters. Same
    * let-binding discipline, still one shuffle-free projection. */
  private def gramExplodePos(docs: DataFrame, idCol: String,
                             textCol: String, n: Int): DataFrame = {
    val grams = element_at(
      transform(array(split(col(textCol), " ")), toks =>
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))), 1)
    docs
      .select(col(idCol).as("doc_id"), col(textCol))
      .filter(size(split(col(textCol), " ")) >= n)
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "gram")))
  }

  /** Span-level exact-substring dedup planner (the actionable half of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022 — their ExactSubstr variant CUTS duplicated
    * spans from documents instead of dropping whole documents):
    * for every document, the merged token-index intervals
    * [cut_start, cut_end) covered by at least one n-gram that occurs in
    * ≥ `minDocs` distinct documents corpus-wide. Overlapping and
    * back-to-back duplicated grams coalesce into one maximal cut span
    * (the classic islands merge), so the output is the minimal set of
    * disjoint spans an excision pass would remove — [[repeatedNgrams]]
    * says WHICH sequences recur; this says WHERE to cut them.
    *
    * Plan shape for 100 TB: the positional explode is one shuffle-free
    * projection; the duplicated-gram set joins back on `gram`
    * (docFreq-bounded, the same Zipf head `minDocs` trims — never
    * all-pairs); the islands merge windows PER DOCUMENT (partition =
    * doc_id), so window state is bounded by document length, not corpus
    * size. Exact int64 indices end to end. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"need n >= 1 and minDocs >= 2, got n=$n minDocs=$minDocs")
    import org.apache.spark.sql.expressions.Window
    val g = gramExplodePos(docs, idCol, textCol, n)
    val dup = g.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("gram"))
    val covered = g.join(dup, Seq("gram"))
      .select(col("doc_id"), col("pos").cast("long").as("_start"),
        (col("pos") + n).cast("long").as("_end"))
    // islands: a span starts a new island iff it begins strictly after
    // the running max end of everything before it (ties impossible —
    // one gram per position); adjacency (start == prev end) merges
    val prev = Window.partitionBy(col("doc_id")).orderBy(col("_start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("doc_id")).orderBy(col("_start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    covered
      .withColumn("_new",
        when(col("_start") > coalesce(max(col("_end")).over(prev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(run))
      .groupBy(col("doc_id"), col("_island"))
      .agg(min(col("_start")).as("cut_start"),
        max(col("_end")).as("cut_end"))
      .select(col("doc_id"), col("cut_start"), col("cut_end"),
        (col("cut_end") - col("cut_start")).as("n_tokens_cut"))
  }

  /** Executes the [[dedupSpans]] cut list: every document with its
    * duplicated spans REMOVED — the excision pass itself (Lee et al.
    * ACL'22 ExactSubstr dedup applied, not just planned). Documents
    * with no duplicated spans (including sub-n docs, which have no
    * grams) pass through verbatim; a fully-duplicated document becomes
    * the empty string rather than disappearing (the caller's
    * drop-empty policy stays explicit).
    *
    * Plan shape: the per-doc cut list aggregates to AT MOST a handful
    * of (start, end) structs per document (merged disjoint spans) and
    * joins back on doc_id; token filtering is one higher-order
    * projection per row — no exploded-token shuffle. Output tokens are
    * single-space rejoined (corpus contract: whitespace-normalized
    * text, the same contract every gram operator here assumes). */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, minDocs: Int = 2): DataFrame = {
    val cuts = dedupSpans(docs, idCol, textCol, n, minDocs)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("cut_start"), col("cut_end"))).as("_cuts"))
    val noCuts = array().cast("array<struct<cut_start:bigint,cut_end:bigint>>")
    val kept = element_at(
      transform(array(split(col(textCol), " ")), toks =>
        filter(toks, (_, i) => !exists(col("_cuts"),
          c => i.cast("long") >= c.getField("cut_start") &&
            i.cast("long") < c.getField("cut_end")))), 1)
    docs
      .select(col(idCol).as("doc_id"), col(textCol))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("_cuts", coalesce(col("_cuts"), noCuts))
      .select(col("doc_id"), array_join(kept, " ").as("text_clean"),
        size(kept).cast("long").as("n_tokens_kept"))
  }

  /** The published Gopher document-quality rule set (Rae et al.,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", 2021, Appendix A1.1), as a per-document rule
    * table: word count in [50, 100000], mean word length in [3, 10],
    * symbol-to-word ratio < 0.1 (# and ellipsis), < 90% of lines
    * bullet-led, < 30% of lines ellipsis-ended, ≥ 80% of words with an
    * alphabetic character, ≥ 2 distinct stop words of the paper's
    * eight. Emitting one boolean PER RULE (plus the conjunction `keep`)
    * is the operational shape: curation teams tune and audit rules
    * individually before composing them.
    *
    * Every ratio threshold is evaluated by integer cross-multiplication
    * (mean word length in [3,10] ⇔ 3·words ≤ chars ≤ 10·words), so the
    * table is exact int64/boolean — no division, no FP, replayable in
    * ANSI SQL. One shuffle-free projection over the scan. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = split(trim(col(textCol)), "\\s+")
    val lines = split(col(textCol), "\n")
    docs.select(
        col(idCol).as("doc_id"),
        size(toks).cast("long").as("n_words"),
        length(regexp_replace(col(textCol), "\\s+", "")).cast("long")
          .as("n_word_chars"),
        (occurrences(col(textCol), "#") +
          occurrences(col(textCol), "...") +
          occurrences(col(textCol), "…")).as("n_symbols"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => trim(l).rlike("^[-*•]")))
          .cast("long").as("n_bullet_lines"),
        size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
          .cast("long").as("n_ellipsis_lines"),
        size(filter(toks, t => t.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha_words"),
        size(array_intersect(array_distinct(toks),
          array(stops.map(lit): _*))).cast("long").as("n_stop_distinct"))
      .withColumn("r_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r_mean_word_len",
        col("n_word_chars") >= col("n_words") * 3L &&
          col("n_word_chars") <= col("n_words") * 10L)
      .withColumn("r_symbol_ratio", col("n_symbols") * 10L < col("n_words"))
      .withColumn("r_bullet_lines",
        col("n_bullet_lines") * 10L < col("n_lines") * 9L)
      .withColumn("r_ellipsis_lines",
        col("n_ellipsis_lines") * 10L < col("n_lines") * 3L)
      .withColumn("r_alpha_words",
        col("n_alpha_words") * 5L >= col("n_words") * 4L)
      .withColumn("r_stop_words", col("n_stop_distinct") >= 2L)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stop_words"))
  }

  /** Corpus data card: the per-stratum datasheet a training-data team
    * reads before anything else — document/token/char volumes, length
    * extremes, and how many docs are byte-exact duplicates of another
    * doc ANYWHERE in the corpus, attributed to their stratum (a stratum
    * can be polluted by copies living in other strata; grouping the
    * dup count within strata would miss exactly those). All fields are
    * exact integers (avg by integral DIV), so the card replays in plain
    * SQL.
    *
    * Plan shape: one aggregation over the strata columns; the exact-dup
    * side groups on md5(text) — 32-byte digests shuffle, never document
    * bodies — and joins the duplicated-digest set back (semi-shaped,
    * skew-bounded: a digest's count is its duplicate family size). */
  def corpusCard(docs: DataFrame, idCol: String, textCol: String,
                 strataCols: Seq[String]): DataFrame = {
    val ks = strataCols.map(col)
    val toks = size(split(col(textCol), " ")).cast("long")
    val base = docs.groupBy(ks: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        max(toks).as("max_tokens"))
      .withColumn("avg_tokens", expr("n_tokens DIV n_docs"))
    val dupDigests = docs.groupBy(md5(col(textCol)).as("_h"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2)
      .select(col("_h"))
    val dupByStratum = docs.withColumn("_h", md5(col(textCol)))
      .join(dupDigests, Seq("_h"))
      .groupBy(ks: _*)
      .agg(count(lit(1)).as("n_exact_dup"))
    base.join(dupByStratum, strataCols, "left")
      .withColumn("n_exact_dup", coalesce(col("n_exact_dup"), lit(0L)))
  }

  /** Per-document duplicated-text fraction — the filter signal built on
    * [[repeatedNgrams]] (the "fraction of characters in duplicated
    * n-grams" cut used by web-scale curation pipelines: a doc that is
    * mostly corpus-duplicated text is boilerplate/spam; a doc with a
    * small duplicated slice merely quotes): for every doc with ≥ n
    * tokens, its gram count, how many of those grams occur in ≥
    * `minDocs` distinct docs corpus-wide, and the fraction as
    * floor-scaled basis points (integral DIV — exact int64, so an
    * oracle replays it without FP drift).
    *
    * Plan shape: the (doc_id, gram) explode is ONE projection consumed
    * by both the corpus docFreq aggregate and the per-doc counts; the
    * duplicated-gram set joins back on `gram` (never all-pairs, skew
    * bounded by the same Zipf head `minDocs` trims). */
  def duplicatedGramFraction(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 5, minDocs: Int = 2): DataFrame = {
    val g = gramExplode(docs, idCol, textCol, n)
    val dup = g.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("gram"))
    val perDoc = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val dupPerDoc = g.join(dup, Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        expr("(coalesce(n_dup, 0L) * 10000L) DIV n_grams").as("dup_frac_e4"))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS algorithm): hash every k-token gram with a
    * portable polynomial fold, slide a window of `w` consecutive gram
    * hashes, and keep the MINIMUM of each window (rightmost position on
    * ties — the paper's robust-winnowing rule), deduplicating the
    * selections. Guarantee: any shared token run of length ≥ w+k-1
    * yields at least one shared fingerprint, while only ~2/(w+1) of
    * positions are retained — position-robust substring dedup at a
    * fraction of the index size, which is precisely what shingle-set
    * Jaccard (order-blind) and whole-doc hashes (brittle to one edit)
    * both miss.
    *
    * Plan shape for 100 TB: everything — token hashes, gram hashes, the
    * window minima — is a chain of higher-order functions over arrays
    * INSIDE one projection, so selection is per-row, shuffle-free, and
    * whole-stage codegen'd; only the (doc_id, pos, fp) selections leave
    * the scan. Docs shorter than k tokens produce no grams (strict
    * definition); when a doc has fewer than w grams its single
    * truncated window selects among all of them, so every doc with ≥ k
    * tokens gets at least one fingerprint.
    *
    * The hash is modular (base 31, mod 1e9+7; every intermediate
    * < 2^35) at both the char→token and token→gram levels, so an
    * oracle replays it exactly in plain BIGINT.
    *
    * Expression-shape caveat that shapes the implementation: Spark's
    * higher-order array functions are interpreted (CodegenFallback),
    * and CollapseProject inlines chained withColumn stages into ONE
    * projection — so a lambda that references a previous stage's array
    * column re-evaluates that array's WHOLE expression at every
    * reference, compounding per nesting level (measured: minutes per
    * 500 docs). Each intermediate array is therefore bound exactly once
    * via the single-element `transform(array(x), v => …)` let-binding,
    * which keeps evaluation linear while staying one shuffle-free
    * projection. */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    val P = 1000000007L
    val charFold = (t: Column) => aggregate(
      transform(split(t, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => pmod(acc * 31L + c, lit(P)))
    def gramsOf(th: Column): Column =
      transform(sequence(lit(0), size(th) - lit(k)),
        i => aggregate(sequence(lit(1), lit(k)), lit(0L),
          (acc, j) => pmod(acc * 31L + element_at(th, i + j), lit(P))))
    def selOf(g: Column): Column = array_distinct(
      transform(sequence(lit(0), greatest(size(g) - lit(w), lit(0))),
        j => aggregate(
          sequence(j, least(j + lit(w - 1), size(g) - lit(1))),
          struct(lit(Long.MaxValue).as("fp"), lit(-1).as("pos")),
          (acc, p) => when(
            element_at(g, p + 1) <= acc.getField("fp"),
            struct(element_at(g, p + 1).as("fp"), p.as("pos")))
            .otherwise(acc))))
    // let toks = split(text); let th = token hashes; let g = gram
    // hashes; emit selections — each bound once, evaluated once
    val sel = element_at(
      transform(array(split(col(textCol), " ")), toks =>
        element_at(
          transform(array(transform(toks, charFold)), th =>
            element_at(
              transform(array(gramsOf(th)), g => selOf(g)), 1)),
          1)),
      1)
    flooredParallelism(docs.select(col(idCol).as("doc_id"), col(textCol)),
        "doc_id")
      .filter(size(split(col(textCol), " ")) >= k)
      .select(col("doc_id"), explode(sel).as("_s"))
      .select(col("doc_id"), col("_s.pos").cast("long").as("pos"),
        col("_s.fp").as("fp"))
  }

  /** MOSS-style similarity pairs over [[winnow]] fingerprints: docs
    * sharing at least `minShared` distinct selected fingerprints. The
    * inverted fingerprint index is the join key — `maxDocFreq` drops
    * boilerplate fingerprints (the skew bound and standard practice,
    * same posture as ngramJaccard's shingle cap), so bucket fan-out is
    * bounded and the join never goes all-pairs. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, w: Int = 4, minShared: Int = 2,
                  maxDocFreq: Int = 100): DataFrame = {
    // the (doc_id, fp) set feeds THREE subtrees (the doc-frequency
    // filter and both sides of the inverted-index self-join) and the
    // winnow selection above it is the op's real CPU — as a lazy
    // subtree each consumer re-ran the whole fingerprint kernel
    // (r19 QueryProbe: three ~10 s-cpuSum kernel stages per pass, 8
    // parquet scans in the returned plan). One eager checkpoint of the
    // compact (doc_id, fp) frame makes it one kernel pass (the rougeN
    // convention; eager-materialization caveat noted there applies).
    val fps = winnow(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
      .localCheckpoint(true)
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDocFreq)
      .select(col("fp"))
    // pin the self-join fan-out (r19): the index frame is small BY
    // BYTES (ids + fingerprints), so AQE coalesces the join exchange
    // to one task, but the bucket self-join + pair aggregation above
    // it is compute-dense (QueryProbe: 0.7 s cpuSum on 1 task). An
    // explicit count is exempt from AQE coalescing, and both join
    // sides are the same frame, so ONE reused exchange feeds the join
    // at full width; the count is the session setting — exactly what
    // the exchange would use at scale, no local-mode constant.
    val idx = fps.join(keep, Seq("fp"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("fp"))
    idx.as("a").join(idx.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** PII redaction for corpus curation: masks email addresses, 16-digit
    * card-like numbers, and phone-like digit runs with typed
    * placeholders, in that order (the card pass must run before the
    * phone pass or the broader phone pattern eats the card digits).
    * Pure codegen'd regexp_replace chain — per-row, no shuffle, no UDF.
    * Patterns are deliberately simple and PORTABLE (plain character
    * classes and bounded repetition — identical semantics in Java regex
    * and RE2, which is what lets the DuckDB oracle replay the scrub):
    * corpus scrubbing wants recall on obvious formats, not an RFC
    * parser. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val card = "\\b\\d{16}\\b"
    val phone = "\\+?\\d[\\d -]{7,}\\d"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        card, "<CARD>"),
      phone, "<PHONE>")
  }

  /** Unigram language-model scoring — the cheap statistical stand-in for
    * perplexity filtering in corpus curation (score docs against the
    * corpus's own token distribution; gibberish and boilerplate sit in
    * the tails). Two passes over a (doc_id, tok) explode: corpus token
    * frequencies, then a per-doc average negative log-probability with
    * add-`alpha` smoothing, p(tok) = (c + alpha) / (N + alpha·V) — the
    * smoothing keeps NEW documents with unseen tokens scoreable against
    * a frozen frequency table.
    *
    * Plan shape: the explode is repartitioned on `tok` ONCE and that
    * exchange feeds all three consumers (frequency aggregate, totals,
    * probe side of the frequency join) via stage reuse — the same trick
    * ngramJaccard uses on `shingle`. The totals are a one-row aggregate
    * broadcast in-plan. Shuffled payloads are (doc_id, tok) and the
    * compact per-token counts, never documents.
    *
    * Output: (doc_id, n_toks, nll_e4) with nll_e4 = floor(mean negative
    * ln-prob × 10⁴) — floor-scaled int64 so cross-engine summation-order
    * ulps can't flip an oracle hash. Docs with no tokens emit no row. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                     alpha: Double = 0.5): DataFrame = {
    val tk = docs
      .select(col(idCol).as("doc_id"),
        explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
          .as("tok"))
      .repartition(col("tok"))
    val tf = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = tk.agg(count(lit(1)).as("n"),
      countDistinct(col("tok")).as("v"))
    tk.join(tf, Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        floor(-avg(log((col("c") + lit(alpha)) /
          (col("n") + lit(alpha) * col("v")))) * 10000)
          .cast("long").as("nll_e4"))
  }

  /** Fixed-size token chunking with overlap — context-window preparation
    * for training/RAG: one row per chunk, covering every token (the last
    * chunk may be short; an empty document yields no chunks).
    * stride = chunkTokens − overlap; chunk i spans tokens
    * [i·stride, i·stride + chunkTokens). Pure per-row codegen'd HOFs
    * (explode over slices of the let-bound token array) — embarrassingly
    * parallel, no shuffle, no UDF. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    // at least ONE chunk for any non-empty doc: the raw ceil zeroes out
    // for docs with 1..overlap tokens, which would silently drop their
    // tokens from the corpus — exactly the docs a "covering every token"
    // contract must not lose
    val nChunks = when(size(col("toks")) > 0,
      greatest(lit(1),
        ceil((size(col("toks")) - lit(overlap)).cast("double") / stride).cast("int")))
      .otherwise(lit(0))
    docs
      .select(col(idCol).as("doc_id"),
        // blank text splits to [""] — normalize to a truly empty array.
        // rlike("\\S"), not trim(): trim strips SPACES only, so a
        // tab/newline-only doc would sneak past it and emit a phantom
        // chunk (and diverge from the oracle's tokenization)
        when(col(textCol).rlike("\\S"), split(col(textCol), "\\s+"))
          .otherwise(array().cast("array<string>")).as("toks"))
      .select(col("doc_id"),
        // sequence(1, 0) DESCENDS in Spark — guard the empty case
        explode(transform(
          when(nChunks >= 1, sequence(lit(0), nChunks - 1))
            .otherwise(array().cast("array<int>")), i => {
          struct(i.cast("long").as("chunk_id"),
            concat_ws(" ", slice(col("toks"), i * stride + 1, lit(chunkTokens)))
              .as("chunk_text"),
            least(lit(chunkTokens), size(col("toks")) - i * stride)
              .cast("long").as("n_tokens"))
        })).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.chunk_text"),
        col("c.n_tokens"))
  }

  /** Zipf rank-frequency diagnostic per group (language/source) — the
    * corpus-health check a datasheet wants: natural text follows
    * freq(r) ∝ r^−s with s ≈ 1 (Zipf 1949; Piantadosi 2014 for the
    * modern survey), while machine-generated spam, boilerplate, and
    * tokenizer damage bend the curve. Token frequencies are ranked per
    * group (freq desc, token asc — deterministic ties) and the curve is
    * sampled at power-of-two ranks 1, 2, 4, …, 2^`maxExp`; OLS of
    * ln(freq) against log₂(rank) over those points gives the slope —
    * per-doubling ln-frequency drop, ≈ −ln 2 · s, so s ≈ 1 shows as
    * slope_e6 ≈ −693147.
    *
    * Everything that must hash-match the oracle is exact int64: x is
    * the doubling index (round(log₂ rank) of an exact power), y is
    * floor(ln(freq)·10⁶) of an INTEGER count (one libm call per point —
    * no cross-engine summation-order exposure), and the OLS runs on
    * integer sums with a single final division, the x_regression
    * discipline. Ranking uses the distributed [[Selection.groupedRank]]
    * (vocabularies are sub-corpus-sized but still far past a one-task
    * sort at 100 TB — the dominant language's vocabulary all lands in
    * one window partition otherwise).
    *
    * Output: one row per group with ≥2 sampled points —
    * (grp, n_points, f1, slope_e6). */
  def zipfSlope(docs: DataFrame, textCol: String, grpCol: String,
                maxExp: Int = 8, numPartitions: Int = 64): DataFrame = {
    require(maxExp >= 1, s"maxExp must be >= 1, got $maxExp")
    val powers = (0 to maxExp).map(1L << _)
    // pinned for the same reason perplexityBuckets pins its scored
    // frame: the grouped rank's range-boundary sample would re-run the
    // tokenize+aggregate otherwise; the vocab frame is sub-corpus-sized
    val tf = docs
      .select(col(grpCol).as("grp"),
        explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
          .as("tok"))
      .groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("_negfreq", -col("freq"))
      .localCheckpoint(true)
    val pts = Selection.groupedRank(tf, Seq("grp"),
        Seq("_negfreq", "tok"), "rank", numPartitions)
      .filter(col("rank").isin(powers: _*))
      .select(col("grp"), col("freq"),
        round(log2(col("rank"))).cast("long").as("x"),
        floor(log(col("freq")) * 1000000.0d).cast("long").as("y"))
    pts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_points"),
        max(when(col("x") === 0, col("freq"))).as("f1"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("_num", col("n_points") * col("sxy") - col("sx") * col("sy"))
      .withColumn("_den", col("n_points") * col("sxx") - col("sx") * col("sx"))
      .filter(col("_den") =!= 0L)
      .select(col("grp").as(grpCol), col("n_points"), col("f1"),
        floor(col("_num").cast("double") / col("_den").cast("double"))
          .cast("long").as("slope_e6"))
  }
}
