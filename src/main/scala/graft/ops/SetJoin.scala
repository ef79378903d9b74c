package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) —
  * the LOSSLESS counterpart to the approximate near-dup paths
  * ([[Dedup.minhashLsh]], [[Dedup.simhashPairs]]): every pair with
  * Jaccard ≥ the threshold is guaranteed to be emitted, with no
  * probabilistic recall and no `maxDocFreq` shingle drop.
  *
  * Why it scales: a pair with Jaccard ≥ t and token sets A, B must share
  * a token inside the first `|A| − ⌈t·|A|⌉ + 1` tokens of A when both
  * sides order their tokens identically (pigeonhole over the canonical
  * order — if the prefixes were disjoint, the overlap is capped below
  * the threshold). So only that PREFIX is exploded into the inverted
  * index — at t = 0.8 roughly a fifth of the full-index volume
  * [[Dedup.ngramJaccard]] shuffles — and ordering tokens by ascending
  * global document frequency puts the RAREST tokens in the prefix, which
  * minimizes candidate fan-out (a stopword shingle shared by half the
  * corpus sits at the back of every list and never generates a
  * candidate; no df cutoff needed).
  *
  * Beyond the reference's equality joins (main.py:382-430) — this is the
  * training-data-curation join ("which documents are ≥80% the same
  * shingles") at exact semantics.
  */
object SetJoin {

  /** All pairs of documents whose word-`n`-gram shingle sets have
    * Jaccard ≥ `minJaccard`, exactly. Output: (id_a, id_b, common,
    * jaccard) with id_a < id_b — the same shape as
    * [[Dedup.ngramJaccard]], but lossless (that operator trades the
    * `maxDocFreq` shingle drop for skew safety; this one suppresses
    * frequent-token fan-out by construction instead).
    *
    * Plan shape (five narrow shuffles, payloads are ids + short shingle
    * strings except the final array fetch):
    *   1. explode distinct shingles → repartition(shingle); the one
    *      exchange is reused by the doc-frequency aggregate AND the
    *      order-assembly consumer (same trick as ngramJaccard).
    *   2. per-doc canonical order: sort tokens by (global df, token),
    *      keep the array + its size.
    *   3. explode ONLY the prefix; self-join on the prefix token with
    *      the size filter t·|B| ≤ |A| ≤ |B| pushed into the join.
    *   4. dedup candidate pairs on (id_a, id_b) — a pair sharing k
    *      prefix tokens verifies once.
    *   5. fetch both token arrays back by doc_id and verify exact
    *      Jaccard via array_intersect. Fetch-back ships each doc's
    *      array ONCE per join side; carrying the array through the
    *      prefix explode would duplicate it per prefix token (~20× at
    *      100-token docs).
    *
    * The FP guard: `⌈t·|A|⌉` computed in doubles can land a hair above
    * the true integer (0.8·5 → 4.0000000000000009 ⇒ ⌈⌉ = 5) and silently
    * shorten the prefix — a recall hole. The 1e-9 slack only ever
    * LENGTHENS the prefix, which costs candidates, never correctness. */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard=$minJaccard must be in (0, 1]")
    // canonical per-doc order: ascending (df, shingle) — deterministic,
    // identical on every node, rare tokens first. ONE materialization
    // (the components()/PageRank pattern): three consumers read the
    // ordered frame — the prefix explode and both verification
    // fetch-backs — and each would otherwise re-execute the explode +
    // df join + per-doc sort-assembly (measured 3× the operator's
    // wall-clock; ReuseExchange only dedups the exchange below the
    // aggregate, not the aggregate itself). At corpus scale the
    // ordered-token frame is the artifact you'd persist as a table.
    val ordered = orderedTokens(docs, idCol, textCol, n)
    // pinned fan-out for the candidate self-join (r19): the prefix
    // frame is small BY BYTES (ids + one token per row), so AQE
    // coalesces the join exchange to 1-2 tasks, but the join and the
    // pair dedup above it are the operator's compute (QueryProbe: a
    // 3.2 s-wall 2-task join stage). An explicit count is exempt from
    // AQE coalescing; both sides are the same frame, so ONE reused
    // exchange feeds the join at full width. The count is the session
    // setting — what the exchange would use at scale anyway.
    val prefixed = ordered
      .withColumn("plen",
        (col("sz") - ceil(lit(minJaccard) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("doc_id"), col("sz"),
        explode(expr("slice(toks, 1, plen)")).as("ptok"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("ptok"))

    val a = prefixed.alias("a")
    val b = prefixed.alias("b")
    val candidates = a.join(b,
        col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id") &&
        // size filter: J ≥ t ⇒ min ≥ t·max (same 1e-9 slack direction)
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(minJaccard) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      // pinned width again (r19): the candidate-pair dedup feeds the
      // fetch-back verification whose array_intersect is the next
      // compute-dense pass — without the pin AQE coalesces the dedup
      // exchange to 1-2 tasks and the verification serializes there
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    val ta = ordered.select(col("doc_id").as("id_a"), col("toks").as("toks_a"),
      col("sz").as("n_a"))
    val tb = ordered.select(col("doc_id").as("id_b"), col("toks").as("toks_b"),
      col("sz").as("n_b"))
    candidates.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long").as("common"),
        col("n_a"), col("n_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "jaccard")
  }

  /** Directed exact CONTAINMENT join: all ordered pairs (a, b), a ≠ b,
    * with |A∩B| / |A| ≥ `minContainment` — the quote/subset detector
    * (a benchmark item inside a training document, a truncated copy
    * inside its source) that Jaccard structurally misses: a 20-token
    * quote in a 2000-token page has Jaccard ≈ 0.01 but containment 1.0.
    *
    * Prefix filtering applies on the PROBE side only: a qualifying A
    * must share a token inside its first |A| − ⌈t·|A|⌉ + 1 canonically-
    * ordered tokens (pigeonhole: if that prefix misses B entirely, the
    * overlap is capped at ⌈t·|A|⌉ − 1 < t·|A|). The INDEX side has no
    * size relation to exploit — any B, however large, may contain A —
    * so it explodes fully: the asymmetric cost model of quote
    * detection, probes pay a short rare-token prefix, the corpus pays
    * its inverted index once. Same canonical df-order, candidate
    * dedup, and fetch-back verification as [[prefixJaccardJoin]]; same
    * 1e-9 slack direction (only ever lengthens the prefix). Output:
    * (id_a, id_b, common, containment_e6) — e6 fixed-point, exact. */
  def prefixContainmentJoin(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, minContainment: Double = 0.8): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"minContainment=$minContainment must be in (0, 1]")
    val ordered = orderedTokens(docs, idCol, textCol, n)
    // both join inputs carry a pinned-width exchange on the join key
    // (r19, same rationale as prefixJaccardJoin): tiny-by-bytes token
    // frames + compute-dense join means AQE's byte-based coalescing
    // serializes the operator's real work onto 1-2 tasks
    val nParts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val probe = ordered
      .withColumn("plen",
        (col("sz") - ceil(lit(minContainment) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("doc_id").as("id_a"),
        explode(expr("slice(toks, 1, plen)")).as("ptok"))
      .repartition(nParts, col("ptok"))
    val index = ordered
      .select(col("doc_id").as("id_b"), explode(col("toks")).as("ptok"))
      .repartition(nParts, col("ptok"))
    val candidates = probe.join(index,
        probe("ptok") === index("ptok") && col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      // pinned width for the dedup exchange feeding the fetch-back
      // verification (same rationale as prefixJaccardJoin's)
      .repartition(nParts, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val ta = ordered.select(col("doc_id").as("id_a"), col("toks").as("toks_a"),
      col("sz").as("n_a"))
    val tb = ordered.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    candidates.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long")
          .as("common"),
        col("n_a"))
      .filter(col("common").cast("double") >=
        lit(minContainment) * col("n_a") - lit(1e-9))
      .select(col("id_a"), col("id_b"), col("common"),
        floor(lit(1000000.0d) * col("common") / col("n_a")).cast("long")
          .as("containment_e6"))
  }

  /** Canonical ordered token arrays per doc — (doc_id, toks, sz) with
    * tokens sorted by ascending (global df, token), checkpointed ONCE
    * for the multiple consumers every prefix join has (see the note in
    * [[prefixJaccardJoin]]). */
  private def orderedTokens(docs: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame = {
    val sh = flooredParallelism(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt")),
        "doc_id")
      .select(col("doc_id"), Dedup.shingles(col("_txt"), n).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), explode(col("shs")).as("shingle"))
    val shP = pinnedWidth(sh, col("shingle"))
    // per-shingle document frequency as a WINDOW over the one shingle
    // exchange (r19): the old groupBy+join-back consumed `sh` twice,
    // and column pruning under the aggregate branch (doc_id dropped)
    // made its exchange non-identical to the join side's, so
    // ReuseExchange never fired and the whole shingle explode ran
    // TWICE (QueryProbe: two ~5 s-cpuSum explode stages per pass).
    // The window's required distribution is satisfied by the
    // repartition, so this is ONE explode pass, one exchange, and no
    // join — the window's per-partition sort by shingle replaces the
    // join's shuffle. Bounded state: a window partition is one
    // shingle's postings, the same rows the join's build side held.
    val wdf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle"))
    shP.withColumn("df", count(lit(1)).over(wdf))
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("shingle")))),
        x => x.getField("shingle")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("sz"))
      .localCheckpoint(true)
  }
}
