package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-pair mining for contrastive embedding models: (anchor,
  * positive, negative) triplets where positives come from a near-dup
  * pair table (MinHash/Jaccard — whatever produced it) and negatives
  * are drawn by DETERMINISTIC hash-rank rotation. Determinism is the
  * point: a `rand()`-sampled negative set is unreproducible across
  * retries and unverifiable against an oracle; rotating a pseudo-random
  * (hash-ordered) global ranking by a fixed shift gives every anchor a
  * negative that is (a) unrelated with near-certainty, (b) stable under
  * re-execution, (c) replayable in SQL.
  *
  * Scale shape: the global ranking is [[Packing.withGlobalRank]] (the
  * two-phase distributed prefix sum — no single-task window), the count
  * is a broadcast 1-row aggregate, and the negative lookup is an
  * equi-join on the rotated rank — shuffles carry (rank, id) pairs
  * only. The rare rotation collision (negative = anchor or positive) is
  * filtered out rather than re-drawn, trading ~shift/N of the pairs for
  * a plan with no iteration. */
object Pairs {

  def contrastiveTriplets(docs: DataFrame, idCol: String, pairs: DataFrame,
                          shift: Long = 37L,
                          numPartitions: Int = 64): DataFrame = {
    require(shift > 0, s"shift must be positive, got $shift")
    require(pairs.columns.length == 2,
      s"pairs must be exactly (anchor id, positive id), got ${pairs.columns.mkString(", ")}")
    val hashed = docs.select(col(idCol))
      .withColumn("_h", Dedup.portableTokenHash(col(idCol).cast("string")))
    val ranked = Packing.withGlobalRank(hashed, Seq("_h", idCol), "_rank",
      numPartitions)
    // count from the SOURCE frame — the prefix sum is row-preserving,
    // and counting `ranked` would re-execute its shuffle just to count
    val n = docs.agg(count(lit(1)).as("_n"))
    // a shift that is a multiple of n would rotate every anchor onto
    // itself and the collision filter would silently drop everything;
    // fall back to 1 in that case (n = 1 stays degenerate by nature —
    // no valid negative exists)
    val eff = when(pmod(lit(shift), col("_n")) === 0, lit(1L))
      .otherwise(pmod(lit(shift), col("_n")))
    val rotated = ranked.crossJoin(broadcast(n))
      .select(col(idCol).as("anchor_id"),
        ((col("_rank") - 1 + eff) % col("_n") + 1).as("_nrank"))
    val byRank = ranked.select(col("_rank").as("_nrank"),
      col(idCol).as("negative_id"))
    pairs.toDF("anchor_id", "positive_id")
      .join(rotated, Seq("anchor_id"))
      .join(byRank, Seq("_nrank"))
      .filter(col("negative_id") =!= col("anchor_id") &&
        col("negative_id") =!= col("positive_id"))
      .select(col("anchor_id"), col("positive_id"), col("negative_id"))
  }
}
