package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style merge induction — tokenizer training's core loop: each
  * round finds the corpus-wide most frequent ADJACENT token pair and
  * fuses every (greedy, left-to-right) occurrence into one symbol.
  * Run at word granularity this induces collocations; at character
  * granularity the identical machinery is byte-pair encoding.
  *
  * Cost model is the honest BPE one: R rounds = R full corpus passes
  * (pair count + rewrite), each a map-side-combined aggregate plus a
  * per-row fold — no shuffle of the documents themselves, ever; only
  * (pair, count) rows move. The argmax pair is ONE driver-side row per
  * round (the PageRank/KMeans coordination pattern), and each round
  * ends in an eager localCheckpoint so the logical plan doesn't grow
  * by a fold per round (the iterative-DataFrame pitfall —
  * Dedup.components notes). The greedy rewrite is a left fold with
  * (emitted, pending) struct state — expressible as a codegen'd
  * `aggregate` HOF here and replayed verbatim by DuckDB's list_reduce,
  * which is what lets the oracle pin every merged sequence.
  */
object Bpe {

  /** One greedy left-to-right merge of adjacent pair (a, b) → "a_b"
    * over a token-array column. Overlaps resolve leftmost-first:
    * [a, a, b] → [a, a_b]; [a, b, a, b] → [a_b, a_b]. */
  def mergeOnce(toks: Column, a: String, b: String): Column = {
    val fused = s"${a}_$b"
    def st(acc: Column, pending: Column) =
      struct(acc.as("acc"), pending.as("pending"))
    val init = st(array().cast("array<string>"), lit(null).cast("string"))
    aggregate(
      toks, init,
      (s, x) =>
        when(s.getField("pending").isNull, st(s.getField("acc"), x))
          .when(s.getField("pending") === a && x === b,
            st(concat(s.getField("acc"), array(lit(fused))),
              lit(null).cast("string")))
          .otherwise(st(concat(s.getField("acc"), array(s.getField("pending"))), x)),
      s => when(s.getField("pending").isNull, s.getField("acc"))
        .otherwise(concat(s.getField("acc"), array(s.getField("pending")))))
  }

  /** Adjacent-pair counts over a token-array column `toks` keyed by any
    * id: one explode of (pos, pos+1) pairs, map-side combined. */
  def pairCounts(docs: DataFrame): DataFrame =
    docs.select(explode(expr(
        "transform(sequence(1, greatest(size(toks) - 1, 0)), " +
          "i -> named_struct('p1', element_at(toks, i), 'p2', element_at(toks, i + 1)))"))
        .as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(count(lit(1)).as("cnt"))

  /** `rounds` merge rounds over `docs(idCol, toks: array<string>)`.
    * Returns the rewritten corpus plus the ordered merge table
    * (round, p1, p2, count-at-selection). Deterministic: the argmax
    * tie-breaks on (count desc, p1 asc, p2 asc). */
  def train(docs: DataFrame, idCol: String,
            rounds: Int): (DataFrame, Seq[(Int, String, String, Long)]) = {
    var cur = docs.select(col(idCol), col("toks")).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("p1").asc, col("p2").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val row = top.head
        val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r, a, b, c))
        cur = cur.withColumn("toks", mergeOnce(col("toks"), a, b))
          .localCheckpoint(true)
      }
    }
    (cur, merges.result())
  }
}
