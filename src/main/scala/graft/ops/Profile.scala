package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the corpus QA pass run before any table is
  * trusted as training input: per-column row/null/distinct counts and
  * min/max, as one TALL frame (column, n, n_null, n_distinct, min_s,
  * max_s) so heterogeneous column types share a schema.
  *
  * ONE aggregation job regardless of column count: all metrics are
  * computed in a single `agg` over the table (map-side partial
  * aggregation does the heavy lifting; the exact distinct counts expand
  * the aggregate but stay one logical pass), then the single result row
  * pivots to tall via an explode of struct literals — no per-column job
  * loop, no driver-side iteration. For corpora where exact distinct is
  * too hot, swap `countDistinct` for `approx_count_distinct` (the
  * HLL++ sketch path pinned by `x_approx_distinct`).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n"),
        col(s"${c}__nn").as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"),
        col(s"${c}__mx").as("max_s"))): _*)).as("m"))
      .select(col("m.column"), col("m.n"), col("m.n_null"),
        col("m.n_distinct"), col("m.min_s"), col("m.max_s"))
  }

  /** Join-key skew report — the diagnostic run BEFORE choosing a join
    * strategy at scale (broadcast? salt? AQE skew split?): the top-`k`
    * heaviest key values with their row counts and share of the table,
    * plus the table-level concentration facts that decide the strategy
    * (total rows, distinct keys, max/mean key multiplicity ratio). One
    * count-by-key aggregate (map-side combined, shuffles one row per
    * DISTINCT key) feeding a driver-small top-k; the single-row totals
    * ride the same aggregate via a rollup-free second pass over the
    * compact per-key frame. Output is one row per heavy hitter:
    * (rank, key value as string, n_rows, share_e6, n_total, n_keys,
    * skew_ratio_e2 = max/mean multiplicity). NULL keys count as a key
    * (they hash to one partition like any value — the classic silent
    * skew source) and print as "NULL". */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
    val totals = perKey.agg(sum(col("n_rows")).as("n_total"),
      count(lit(1)).as("n_keys"), max(col("n_rows")).as("max_rows"))
    // TakeOrdered top-k first (distributed), THEN rank the k survivors —
    // a global row_number window before the cut would funnel every
    // distinct key through one task
    perKey
      .orderBy(col("n_rows").desc, col(keyCol).asc_nulls_first)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_rows").desc, col(keyCol).asc_nulls_first)))
      .crossJoin(broadcast(totals))
      .select(col("rank"),
        coalesce(col(keyCol).cast("string"), lit("NULL")).as("key_value"),
        col("n_rows"),
        floor(col("n_rows") * lit(1e6) / col("n_total")).cast("long").as("share_e6"),
        col("n_total"), col("n_keys"),
        floor(col("max_rows") * col("n_keys") * lit(100) / col("n_total"))
          .cast("long").as("skew_ratio_e2"))
  }

  /** Exact top-`k` most frequent values of a column without shuffling
    * the long tail — the corpus-vocabulary question ("which tokens /
    * URLs / shingles dominate") where the distinct-value count is the
    * scale hazard: a plain count-by-value aggregate shuffles one row
    * per DISTINCT value, billions for web-scale vocabularies, to
    * produce a k-row answer.
    *
    * Two passes:
    *   1. candidate generation: per-partition Misra-Gries summaries of
    *      `capacity` counters (mapPartitions — genuinely imperative
    *      bounded-state logic, the documented exception to
    *      expression-only operators). An item absent from a partition's
    *      summary has partition-local count ≤ n_p/(capacity+1); summing
    *      over partitions, any value with GLOBAL count > N/(capacity+1)
    *      survives in at least one summary — the candidate set provably
    *      contains every sufficiently-heavy hitter, and its size is
    *      bounded by partitions × capacity regardless of N.
    *   2. exact recount: broadcast the candidate values, semi-join the
    *      column (map-side filter — the tail is dropped BEFORE the
    *      exchange), count exactly, take the top k with a deterministic
    *      (count desc, value asc) order.
    *
    * The result is the EXACT top-k whenever the true k-th frequency
    * exceeds N/(capacity+1) — `capacity` is the explicit knob trading
    * summary memory for how far down the tail exactness reaches
    * (ProfileSpec pins the guarantee; the x_heavy_hitters oracle is the
    * full count-by-value top-k). NULLs are excluded (no frequency
    * semantics). */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
                   capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(capacity >= k, s"capacity $capacity must be >= k $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
    val candidates = vals.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        counts.get(v) match {
          case Some(c) => counts.update(v, c + 1)
          case None if counts.size < capacity => counts.update(v, 1L)
          case None =>
            // decrement-all: each event burns capacity+1 count mass
            // (capacity decrements + the skipped item), so events number
            // ≤ n_p/(capacity+1) — O(n_p) total despite the O(capacity)
            // sweep
            counts.mapValuesInPlace((_, c) => c - 1)
            counts.filterInPlace((_, c) => c > 0)
        }
      }
      counts.keysIterator
    }.toDF("v").distinct()
    vals.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("v").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("v").asc)))
      .select(col("rank"), col("v").as("value"), col("cnt"))
  }

  /** Equi-depth (equal-frequency) histogram of a long column: `k`
    * buckets of ~n/k rows each with their [lo, hi] value ranges — the
    * profile that stays informative on skewed data, where equi-WIDTH
    * bins collapse into one hot bin.
    *
    * `ntile` over a global ORDER BY would funnel the table through a
    * single task; the bucket index is instead `(rank−1)·k div n` over
    * [[Packing.withGlobalRank]] (the two-phase distributed prefix sum)
    * with the row count broadcast as a 1-row aggregate — every stage
    * distributed, results deterministic given the (`valueCol`,
    * `tieCol`) total order and engine-portable (the oracle replays rank
    * and bucket arithmetic exactly). */
  def equiDepthHistogram(df: DataFrame, valueCol: String, tieCol: String,
                         k: Int, numPartitions: Int = 64): DataFrame = {
    require(k >= 1, s"bucket count must be positive, got $k")
    val ranked = Packing.withGlobalRank(df.select(col(valueCol), col(tieCol)),
      Seq(valueCol, tieCol), "_rank", numPartitions)
    // count from the source — the prefix sum is row-preserving, and
    // counting `ranked` would re-execute its shuffle just to count
    val n = df.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        intDiv((col("_rank") - 1) * k, col("_n")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Referential-integrity audit — one row per declared relationship:
    * (rel, n_child, n_orphan, orphan_e6). A warehouse ingesting
    * independent feeds checks FK closure BEFORE joins silently drop
    * rows (an inner join "loses" orphans with no error — this surfaces
    * them as a number a gate can threshold on). One pass per
    * relationship: left join child FKs against the distinct parent
    * keys and count the misses map-side — the parent key set ships
    * compressed through the join's shuffle, never the child payload.
    * NULL FKs count as orphans (a NULL never joins — exactly the
    * silent-drop case the audit exists to catch). */
  def refIntegrity(child: DataFrame, fkCol: String,
                   parent: DataFrame, pkCol: String, rel: String): DataFrame =
    child.select(col(fkCol).as("fk"))
      .join(parent.select(col(pkCol).as("fk")).distinct()
          .withColumn("_hit", lit(1)),
        Seq("fk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphan"))
      .select(lit(rel).as("rel"), col("n_child"), col("n_orphan"),
        // empty-child guard: 0/0 is NaN and ANSI floor(..).cast throws
        when(col("n_child") > 0,
          floor(lit(1000000.0d) * col("n_orphan") / col("n_child"))
            .cast("long")).as("orphan_e6"))

  /** EXACT join-size prediction without running the join — the planning
    * probe behind "can this join be materialized at all": inner-join
    * cardinality = Σ over matching keys of cntL·cntR, computed on the
    * per-key COUNT frames (one row per distinct key), so the heavy
    * tables are touched once each for a count-by-key and the final join
    * is distinct-keys × distinct-keys — free next to the join being
    * sized, and exact where sketch-based estimates can be off by the
    * very skew factor one is probing for. Output also carries the
    * distinct-key overlap and the max single-key contribution (the
    * skew share AQE would have to split). NULL keys are excluded on
    * both sides — an inner equi-join can never match them. */
  def joinCardinality(left: DataFrame, lKey: String,
                      right: DataFrame, rKey: String): DataFrame = {
    val a = left.filter(col(lKey).isNotNull)
      .groupBy(col(lKey).as("k")).agg(count(lit(1)).as("cl"))
    val b = right.filter(col(rKey).isNotNull)
      .groupBy(col(rKey).as("k")).agg(count(lit(1)).as("cr"))
    a.join(b, Seq("k"), "full")
      .agg(
        sum(coalesce(col("cl"), lit(0L))).as("n_left"),
        sum(coalesce(col("cr"), lit(0L))).as("n_right"),
        sum(when(col("cl").isNotNull, 1L).otherwise(0L)).as("keys_left"),
        sum(when(col("cr").isNotNull, 1L).otherwise(0L)).as("keys_right"),
        sum(when(col("cl").isNotNull && col("cr").isNotNull, 1L)
          .otherwise(0L)).as("keys_common"),
        sum(when(col("cl").isNotNull && col("cr").isNotNull,
          col("cl") * col("cr")).otherwise(0L)).as("join_rows"),
        max(when(col("cl").isNotNull && col("cr").isNotNull,
          col("cl") * col("cr"))).as("max_key_rows"))
  }
}
