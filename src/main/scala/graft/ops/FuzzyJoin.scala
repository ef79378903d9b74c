package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage (fuzzy join) at corpus scale.
  *
  * The naive formulation — `a JOIN b ON levenshtein(a.s, b.s) <= k` — is
  * an all-pairs cross join: O(|A|·|B|) distance evaluations, unrunnable
  * at 100 TB. This operator uses *deletion-neighborhood blocking* (the
  * FastSS / symmetric-delete family): every string generates the set of
  * variants obtainable by deleting at most `k` characters, both sides
  * are exploded on those keys, and candidates are pairs sharing a key.
  *
  * Completeness (why no true pair is missed): if `lev(a, b) <= k`, an
  * edit script of length ≤ k transforms `a` into `b`; deleting from `a`
  * the positions the script substitutes/deletes, and from `b` the
  * positions it substitutes/inserts, leaves the same string — so some
  * `da ∈ del≤k(a)` equals some `db ∈ del≤k(b)`, and the pair shares the
  * key `da`. Exact `levenshtein` then filters false candidates, so the
  * result is EXACTLY the naive join's, at index-join cost.
  *
  * Scale shape: a string of length L yields 1+L keys at k=1 (O(L²) at
  * k=2) — the exploded index is a small constant factor of the input,
  * shuffled on short key strings. Two shuffles end-to-end: (key) for the
  * candidate join, (pair) for the dedup. Hot keys (one deletion shared
  * by a huge near-identical cluster) are the skew hazard, bounded by
  * `maxKeyFreq` exactly like `Dedup.ngramJaccard`'s `maxDocFreq`: keys
  * matching more than that many rows on either side are dropped from
  * pair generation (a pair is lost only if ALL its shared keys are hot —
  * which at a sane cap means a duplicate clique better collapsed by
  * [[Dedup.exact]] first).
  */
object FuzzyJoin {

  /** All strings obtainable from `str` by deleting at most one character
    * (the string itself included), distinct. `sequence(1, 0)` DESCENDS in
    * Spark, so the empty string is guarded explicitly. */
  def deletions1(str: Column): Column = {
    val deletes = when(length(str) >= 1,
      transform(sequence(lit(1), length(str)), i =>
        concat(str.substr(lit(1), i - 1), str.substr(i + 1, length(str)))))
      .otherwise(array().cast("array<string>"))
    array_distinct(concat(array(str), deletes))
  }

  /** Deletion neighborhood with up to `k` deletions (k ∈ {1, 2}). k=2 is
    * the 1-deletion set of every 1-deletion variant — already "at most",
    * since each variant set includes its own source. */
  def deletionKeys(str: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"maxDist must be 1 or 2, got $k")
    if (k == 1) deletions1(str)
    else array_distinct(flatten(transform(deletions1(str), v => deletions1(v))))
  }

  /** Fuzzy join: all (left, right) row pairs whose strings are within
    * levenshtein distance `maxDist`. Output columns are the four input
    * columns plus `dist` (bigint). Null/empty join strings never match.
    * (id, str) is treated as the row key: a side containing the SAME
    * (id, str) row twice contributes each match once, not twice — the
    * pair-dedup that collapses multi-key candidates collapses duplicate
    * input rows with them.
    *
    * The exact-distance filter uses Spark's thresholded `levenshtein`
    * (early-exit once the running distance exceeds the threshold — the
    * band-limited DP is O(k·L) per pair instead of O(L²)). */
  def join(left: DataFrame, leftId: String, leftStr: String,
           right: DataFrame, rightId: String, rightStr: String,
           maxDist: Int, maxKeyFreq: Long = 10000): DataFrame = {
    require(Set(leftId, leftStr, rightId, rightStr).size == 4,
      "left/right id and string column names must all be distinct " +
        "(alias before joining) — the output carries all four")
    // The key-frequency branch deliberately RE-DERIVES the explode
    // instead of sharing an exchange with the join probe (audited on the
    // sf0.1 plan): column pruning gives it a (str, dk)-only scan whose
    // partial aggregation shuffles just (dk, count) — cheaper at every
    // scale than re-reading a full-width (id, str, dk) exchange, and an
    // explicit repartition to force reuse adds a pure extra shuffle of
    // the fat index whenever the planner picks a broadcast join (which
    // needs no distribution at all).
    def indexed(df: DataFrame, id: String, str: String): DataFrame =
      df.filter(col(str).isNotNull && length(col(str)) > 0)
        .select(col(id), col(str),
          explode(deletionKeys(col(str), maxDist)).as("dk"))

    def capped(ix: DataFrame): DataFrame =
      ix.join(
        ix.groupBy("dk").agg(count(lit(1)).as("kf"))
          .filter(col("kf") <= maxKeyFreq).select("dk"),
        Seq("dk"))

    val l = capped(indexed(left, leftId, leftStr)).alias("l")
    val r = capped(indexed(right, rightId, rightStr)).alias("r")
    l.join(r, col("l.dk") === col("r.dk"))
      .select(col(s"l.$leftId"), col(s"l.$leftStr"),
        col(s"r.$rightId"), col(s"r.$rightStr"))
      .distinct()
      .withColumn("dist",
        levenshtein(col(leftStr), col(rightStr), maxDist).cast("long"))
      .filter(col("dist") >= 0)
  }

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter,
    * JASA 1969) over BLOCKED candidates: pairs sharing the blocking key
    * are scored by summed per-field agreement weights and classified by
    * the two-threshold decision rule — `match` above `upper`,
    * `non_match` below `lower`, `possible` (clerical review) between.
    *
    * `fields` carries (column, agreeWeight, disagreeWeight) with the
    * caller's weights standing in for the theory's log-likelihood
    * ratios log(m/u) and log((1−m)/(1−u)) as EXACT integers (the
    * engine-wide fixed-point discipline — float logs would make the
    * score order-sensitive). A NULL on either side contributes 0: no
    * evidence either way, per the missing-at-random treatment.
    *
    * Scale shape: candidates come from an equi-join on `blockCols` —
    * never all-pairs — and `maxBlockRows` drops blocks larger than that
    * on EITHER side before pair generation (the standard oversized-
    * block guard: a degenerate block of n rows is n² pairs handed to
    * one reducer; real deployments re-block such rows on a finer key).
    * Scoring is one codegen'd projection on the joined rows.
    *
    * Output: (id_a, id_b, score, decision) for every surviving
    * candidate pair — the caller filters to the decision class it
    * wants (emitting all three keeps the clerical-review band, the
    * point of the FS model, visible). */
  def linkage(a: DataFrame, idA: String, b: DataFrame, idB: String,
              blockCols: Seq[String], fields: Seq[(String, Long, Long)],
              upper: Long, lower: Long,
              maxBlockRows: Long = 10000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(fields.nonEmpty, "need at least one comparison field")
    require(upper >= lower, s"thresholds inverted: upper=$upper lower=$lower")
    def side(df: DataFrame, id: String, pfx: String): DataFrame = {
      val sel = col(id).as(s"${pfx}id") +:
        (blockCols.map(c => col(c).as(s"_bk_$c")) ++
          fields.map { case (f, _, _) => col(f).as(s"$pfx$f") })
      val keyed = df.select(sel: _*)
      // oversized-block guard, applied per side BEFORE the pair join
      val ok = keyed.groupBy(blockCols.map(c => col(s"_bk_$c")): _*)
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= maxBlockRows)
        .drop("_bn")
      keyed.join(ok, blockCols.map(c => s"_bk_$c"))
    }
    val score = fields.map { case (f, wa, wd) =>
      when(col(s"_a_$f").isNull || col(s"_b_$f").isNull, lit(0L))
        .when(col(s"_a_$f") === col(s"_b_$f"), lit(wa))
        .otherwise(lit(wd))
    }.reduce(_ + _)
    side(a, idA, "_a_").join(side(b, idB, "_b_"), blockCols.map(c => s"_bk_$c"))
      .select(col("_a_id").as("id_a"), col("_b_id").as("id_b"),
        score.as("score"))
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "non_match").otherwise("possible"))
  }
}
