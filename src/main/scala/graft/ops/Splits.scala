package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for corpus curation: train/val/test
  * assignment as a PURE FUNCTION of the record id. A 100 TB pipeline
  * cannot afford sampling drift — a rerun, a backfill, or a different
  * engine must put every record in the same split — so the assignment is
  * a stateless, shuffle-free projection over an engine-portable modular
  * hash ([[Dedup.portableTokenHash]]; the oracle replays it in DuckDB),
  * never `rand()` or a sampled materialization.
  */
object Splits {

  /** Basis-point bucket of the record id under the portable hash — THE
    * oracle-replayed contract every decision in this module derives
    * from; one definition so the three call sites cannot drift. */
  private def bpBucket(idCol: Column): Column =
    pmod(Dedup.portableTokenHash(idCol.cast("string")), lit(10000L))

  /** Adds a `split` column. `fractions` are (name, weight) pairs,
    * normalized over their sum; assignment buckets
    * `pmod(hash(id), 10000)` by cumulative thresholds in basis points,
    * so two calls with the same fractions agree row-for-row and splits
    * partition the corpus exactly (every bucket falls in one range). */
  def assignSplit(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)] =
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be non-empty positive weights")
    val total = fractions.map(_._2).sum
    val bucket = bpBucket(col(idCol))
    val bounds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w / total * 10000))
    val assigned = fractions.zip(bounds).init
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), ub)) =>
        Some(acc.fold(when(bucket < ub, name))(_.when(bucket < ub, name)))
      }
    df.withColumn("split",
      assigned.fold(lit(fractions.head._1))(_.otherwise(fractions.last._1)))
  }

  /** Deterministic k-fold assignment for cross-validation: adds `fold`
    * (0..k-1) as a pure function of the id — `pmod(bucket(id), k)` over
    * the same portable-hash bucket every split decision here uses, so
    * folds are reproducible across runs/engines, partition the corpus
    * exactly, and are uniform to bucket resolution. `foldSlices(i)`
    * then gives the (train, holdout) pair for fold i as two filters
    * over ONE assignment — no materialization per fold. */
  def assignFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold", pmod(bpBucket(col(idCol)), lit(k.toLong)))
  }

  /** The fold-i view over an [[assignFold]] frame: (train = fold ≠ i,
    * holdout = fold = i). */
  def foldSlices(assigned: DataFrame, i: Int): (DataFrame, DataFrame) =
    (assigned.filter(col("fold") =!= i), assigned.filter(col("fold") === i))

  /** Deterministic per-group downsampling — the "cap each language /
    * source at N documents" rebalancing step of corpus curation. Keeps a
    * row iff `bucket(id) * group_count < cap * 10000` (integer
    * cross-multiplication of `bucket/10000 < cap/count` — no doubles,
    * no engine-specific rounding): groups at or under the cap survive
    * whole, larger groups keep a hash-uniform ~`cap`-row subset. Like
    * [[assignSplit]] the decision is a pure function of the id, so
    * reruns, backfills and other engines keep the SAME rows, and caps
    * nest (the cap-50 subset is contained in the cap-100 subset). The
    * group-count side is a tiny aggregate broadcast back onto the
    * corpus — one scan, no corpus-wide shuffle. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  cap: Long): DataFrame = {
    require(cap > 0, "cap must be positive")
    // internal columns carry a reserved prefix so a user frame that
    // already has e.g. a `grp_n` column can't collide into an
    // ambiguous-reference error (or a silently wrong filter)
    val nCol = "_graft_grp_n"
    val bCol = "_graft_grp_bucket"
    require(!df.columns.contains(nCol) && !df.columns.contains(bCol),
      s"input must not contain reserved columns $nCol/$bCol")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as(nCol))
    df.join(broadcast(counts), groupCol)
      .withColumn(bCol, bpBucket(col(idCol)))
      .filter(col(bCol) * col(nCol) < lit(cap * 10000L))
      .drop(bCol, nCol)
  }

  /** EXACTLY `k` rows per group (fewer only when the group is smaller),
    * chosen hash-uniformly and deterministically: rows rank by a
    * fine-grained portable-hash priority (ties by id) and the k best
    * per group survive. Where [[capPerGroup]] keeps a ~cap-sized subset
    * with a join-free filter (the at-scale default), this gives the
    * exact-count contract evaluation sets need — at the cost of a
    * per-group selection, which rides [[TopK.perGroup]]'s bounded-buffer
    * aggregation (≤k entries per group per map partition; no full-group
    * sort). Output: (groupCols..., rank, id) — ids only; semi-join back
    * for payloads so the selection never shuffles document bodies.
    * The 10⁶-resolution priority is exactly representable in the
    * aggregator's double and replayable by the oracle (the full 62-bit
    * hash is not: doubles lose bits past 2⁵³). */
  def sampleExactPerGroup(df: DataFrame, idCol: String,
                          groupCols: Seq[String], k: Int): DataFrame = {
    val pCol = "_graft_s_prio"
    require(!df.columns.contains(pCol),
      s"input must not contain reserved column $pCol")
    val prioritized = df.withColumn(pCol,
      -pmod(Dedup.portableTokenHash(col(idCol).cast("string")), lit(1000000L))
        .cast("double"))
    TopK.perGroup(prioritized, groupCols, pCol, idCol, k)
      .select((groupCols.map(col) :+ col("rank")) :+ col("id"): _*)
  }

  /** Deterministic per-row weighted sampling: keep each row with
    * probability `weightNumCol / weightDen` (a per-row integer numerator
    * against a constant denominator — e.g. a quality score against its
    * max), decided by the row's portable hash bucket. Reproducible
    * across runs and engines where `rand() < w` is neither; join-free,
    * one codegen'd filter; the keep decision is the EXACT integer
    * cross-multiplication `bucket · den < num · 10⁴` (capPerGroup's
    * trick), so the oracle replays the kept ROW SET, not just its size.
    * Resolution is 1/10⁴ — weights quantize to basis points. */
  def sampleByWeight(df: DataFrame, idCol: String, weightNumCol: String,
                     weightDen: Long): DataFrame = {
    // bucket·den must stay in int64 (bucket < 10⁴); numerators share the
    // same envelope — ANSI mode would throw on overflow, but failing at
    // construction beats failing mid-job
    require(weightDen > 0 && weightDen <= Long.MaxValue / 10000L,
      s"weightDen must be in (0, 2^63/10^4], got $weightDen")
    val bCol = "_graft_w_bucket"
    require(!df.columns.contains(bCol),
      s"input must not contain reserved column $bCol")
    df.withColumn(bCol, bpBucket(col(idCol)))
      .filter(col(bCol) * lit(weightDen) < col(weightNumCol) * lit(10000L))
      .drop(bCol)
  }
}
