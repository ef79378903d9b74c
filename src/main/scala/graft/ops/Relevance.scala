package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring for training-data curation: TF-IDF salient
  * terms per document and BM25 ranked retrieval. Both are two-aggregation
  * pipelines over an exploded token table — no UDFs, no driver-side
  * iteration, and the corpus-level statistics (document frequency, average
  * document length) stay IN-PLAN as broadcast one-row aggregates rather
  * than `.collect()`ed constants, so the same code runs unchanged on a
  * 100 TB corpus.
  *
  * Cross-engine determinism (the oracle recomputes everything in DuckDB):
  *   - per-(doc,term) scores are `floor(x * 1e6)` int64 BEFORE any
  *     summation, so score sums are order-insensitive;
  *   - `avgdl` is `sum(dl)/count` with an exact integer sum — never
  *     `avg()`, whose incremental-mean implementation differs by engine;
  *   - rankings order by the unrounded score with a total-order tie-break
  *     (term, then doc id), so the top-k boundary cannot flip.
  */
object Relevance {

  // NO parallelism floor here (r18 opt note): this explode is a plain
  // whitespace split — not compute-dense — and the floor's extra
  // exchange per termCounts consumer measured SLOWER (x_bm25_pruned
  // 1.8 → 2.3 s); the floor stays on the shingling/winnow/gram kernels
  // where per-row CPU dominates.
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)

  /** (doc_id, term, tf) with tf = raw occurrence count — one shuffle on
    * (doc_id, term), map-side combined. The ONE tokenization contract
    * shared by tf-idf, BM25, and `TextAnalysis.repetitionSignals` (and
    * replayed by their DuckDB oracles): whitespace split, empty tokens
    * dropped.
    *
    * Public on purpose: the scoring functions consume this frame through
    * their `*FromCounts` overloads, and each corpus statistic re-derives
    * from it, so Catalyst re-executes the explode once per consumer when
    * the frame is built inline (differing pushed filters defeat
    * ReuseExchange). At exploratory SF that is fine; at 100 TB
    * materialize it once — `termCounts(...).persist(...)` for a session,
    * or written as a table for a corpus queried repeatedly — and every
    * downstream score becomes a pass over counts instead of text. */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` salient terms per document by tf·idf with idf = ln(N/df):
    * (doc_id, term, tf, df, tfidf_e6). Document frequency re-aggregates
    * the term-count table on `term` (not the raw tokens — it is one row
    * per (doc,term) already); N is an in-plan one-row broadcast.
    *
    * The rank orders by the floor-scaled INT score, not the raw double:
    * distinct (tf, df) pairs can yield mathematically equal scores via
    * different float paths (2·ln(1.25) vs ln(1.5625)), whose last-ulp
    * results may order differently across engines — int comparison plus
    * the term tie-break is a total order both engines agree on. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame =
    tfIdfTopTermsFromCounts(termCounts(docs, idCol, textCol), k)

  /** [[tfIdfTopTerms]] over a precomputed (doc_id, term, tf) frame —
    * the scale path (see [[termCounts]]). */
  def tfIdfTopTermsFromCounts(tc: DataFrame, k: Int = 3): DataFrame = {
    val df_ = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tc.select(col("doc_id")).distinct().agg(count(lit(1)).as("n_docs"))
    val scored = tc.join(df_, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_e6",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * lit(1e6))
          .cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_e6").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf_e6"))
  }

  /** BM25 top-`k` documents for a bag of query terms:
    * (doc_id, n_matched, score_e6), ranked by the summed-int score with
    * doc_id as tie-break. Standard Robertson/Sparck-Jones BM25 with
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1); N and avgdl cover documents
    * with at least one token. The probe side is filtered to the query's
    * terms FIRST, so the per-doc join carries only matching rows — the
    * corpus-sized tables never meet an exchange wider than the match
    * set. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromCounts(termCounts(docs, idCol, textCol), queryTerms, k, k1, b)

  /** [[bm25TopK]] over a precomputed (doc_id, term, tf) frame — the
    * scale path (see [[termCounts]]). */
  def bm25TopKFromCounts(tc: DataFrame, queryTerms: Seq[String], k: Int = 20,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame =
    queryContribs(tc, queryTerms, k1, b)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)

  /** Per-(doc, query-term) BM25 contribution — the shared core of the
    * exact and MaxScore-pruned rankers. */
  private def queryContribs(tc: DataFrame, queryTerms: Seq[String],
                            k1: Double, b: Double): DataFrame = {
    // per-doc length from the term-count table (sum of tfs) — no second
    // pass over the raw tokens
    val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df_ = tc.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tc.filter(col("term").isin(queryTerms: _*))
      .join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib_e6", bm25ContribE6(k1, b))
  }

  /** The floor-scaled BM25 term contribution over (tf, df, n_docs, dl,
    * avgdl) columns. Constants enter as the same decimal literals the
    * oracle SQL uses and are combined by IEEE ops on both engines
    * (never pre-evaluated into a different literal — 1.2 + 1.0 and a
    * literal 2.2 round differently), so the doubles agree bit-for-bit. */
  private def bm25ContribE6(k1: Double, b: Double): Column =
    floor(
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
        * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) *
          (col("dl").cast("double") / col("avgdl"))))
        * lit(1e6)).cast("long")

  /** Batch retrieval: BM25 top-k per query for a whole QUERIES TABLE in
    * one plan — the shape a retrieval/eval pipeline actually runs
    * (thousands of queries against the corpus), where a per-query loop
    * would launch thousands of jobs. Queries explode to distinct
    * (query_id, term) pairs that BROADCAST-join the term-count table —
    * the corpus-sized side never shuffles for query fan-out; a term
    * shared by q queries fans its postings out q ways exactly as q
    * separate runs would. df/idf are corpus-level (identical to the
    * single-query ranker); the per-query top-k is a window partitioned
    * by query_id, so ranking shuffles only the scored (query, doc)
    * aggregate. Output: (query_id, doc_id, n_matched, score_e6, rk ≤ k)
    * with the same total-order tie-break as [[bm25TopK]]. */
  def bm25BatchTopKFromCounts(tc: DataFrame, queries: DataFrame,
                              queryIdCol: String, queryTextCol: String,
                              k: Int = 20, k1: Double = 1.2,
                              b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(filter(split(col(queryTextCol), "\\s+"),
        t => length(t) > 0))).as("term"))
    val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df_ = tc.join(broadcast(qt.select(col("term")).distinct()),
        Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tc.join(broadcast(qt), Seq("term"))
      .join(broadcast(df_), Seq("term"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib_e6", bm25ContribE6(k1, b))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("contrib_e6")).as("score_e6"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_e6").desc, col("doc_id"))))
      .filter(col("rk") <= k)
  }

  /** [[bm25BatchTopKFromCounts]] from raw documents. */
  def bm25BatchTopK(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String,
                    queryTextCol: String, k: Int = 20,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25BatchTopKFromCounts(termCounts(docs, idCol, textCol), queries,
      queryIdCol, queryTextCol, k, k1, b)

  /** MaxScore-pruned BM25 top-k (Turtle & Flood's upper-bound pruning,
    * recast for a batch engine): identical output to [[bm25TopK]] —
    * DocsSpec asserts equality and x_bm25_pruned's oracle is the exact
    * ranking — but docs matching ONLY low-impact query terms never
    * enter the scoring aggregate.
    *
    *  1. ub(term) = max per-doc contribution of the term;
    *  2. θ = the k-th highest single-term contribution taken per-doc —
    *     at least k docs score ≥ θ, so θ lower-bounds the true k-th
    *     best total;
    *  3. terms are sorted by ub ascending; the maximal prefix whose ub
    *     sum stays BELOW θ is non-essential — a doc matching only that
    *     prefix tops out strictly below θ and can never reach the
    *     top-k, tie-breaks included;
    *  4. candidate docs = docs matching ≥1 essential term (semi-join);
    *     only their rows flow into the exact scoring aggregate.
    *
    * The trade is explicit: ub/θ/essential are query-sized (|Q| rows,
    * broadcast) but candidate selection adds a doc-id semi-join, so the
    * pruned plan WINS when the query mixes salient terms with frequent
    * low-idf ones (the stopword posting list stops generating
    * candidates — at corpus scale that list is the cost) and merely
    * breaks even on all-rare queries. */
  def bm25TopKPrunedFromCounts(tc: DataFrame, queryTerms: Seq[String],
                               k: Int = 20, k1: Double = 1.2,
                               b: Double = 0.75): DataFrame = {
    val contrib = queryContribs(tc, queryTerms, k1, b)
    val theta = contrib.groupBy(col("doc_id")).agg(max(col("contrib_e6")).as("pmax"))
      .orderBy(col("pmax").desc).limit(k)
      .agg(coalesce(min(col("pmax")), lit(Long.MinValue)).as("theta"))
    val ub = contrib.groupBy(col("term")).agg(max(col("contrib_e6")).as("ub"))
    // |Q|-row window — the single partition is the point, not a hazard
    val essential = ub
      .withColumn("csum", sum(col("ub")).over(
        Window.orderBy(col("ub").asc, col("term"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(theta))
      .filter(col("csum") >= col("theta"))
      .select(col("term"))
    val candidates = contrib
      .join(broadcast(essential), Seq("term"), "left_semi")
      .select(col("doc_id")).distinct()
    contrib.join(candidates, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
  }

  /** [[bm25TopKPrunedFromCounts]] from raw documents. */
  def bm25TopKPruned(docs: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String], k: Int = 20,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKPrunedFromCounts(termCounts(docs, idCol, textCol), queryTerms, k, k1, b)

  /** Positional inverted index: (doc_id, tok, pos), pos 1-based over the
    * RAW whitespace split (empty artifacts dropped after position
    * assignment, so positions are stable whether or not the text has
    * doubled spaces — and the oracle's generate_subscripts agrees).
    * Like [[Dedup.lshIndex]] this is the persistable corpus artifact:
    * write it once, and phrase queries probe postings instead of
    * re-tokenizing text. */
  def positionalIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("pos0", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("tok"), (col("pos0") + 1).as("pos"))

  /** Exact phrase search over a [[positionalIndex]]: documents
    * containing `phrase` as consecutive tokens, with the match count
    * and first position. The scale property a LIKE scan lacks: each
    * phrase word filters the index to ITS postings only (at 100 TB,
    * partition/row-group pruning on `tok` makes that a sliver of the
    * corpus), and adjacency is equi-joins on the aligned start
    * position — no full-text pass, no regex. Word i's postings shift
    * to `pos − i`, so a phrase occurrence is one (doc_id, start) key
    * present in every slice; positions are unique per document, so the
    * joins cannot fan out. */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val slices = phrase.zipWithIndex.map { case (w, i) =>
      index.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    slices.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
  }
}
