package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.call_function

/** Shared expression helpers for the operator package. */
package object ops {

  /** Integer division (`div`): truncates toward zero, same as DuckDB's
    * `//` — the ONE definition of the idiom every fixed-point operator
    * (Packing, PageRank, Resample, Mixture, meanPoolE6, histogram)
    * leans on; keep callers on this so a semantics change has a single
    * home. For true FLOOR division on possibly-negative dividends use
    * `a - pmod(a, b)` first (pmod is non-negative). */
  private[graft] def intDiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** Parallelism FLOOR for compute-dense kernels (shingling, n-gram
    * explode, signature hashing) whose input may arrive as a handful
    * of scan splits — the guide §2.5 "one huge unsplittable file"
    * case: a small-by-bytes parquet file is one row group, so the
    * scan is ONE task and every downstream map-side kernel runs
    * single-threaded regardless of cores (measured: the whole
    * shingle+explode pass of a dedup query serialized on one task at
    * bench SF). When the input already carries at least the session's
    * parallelism this is a NO-OP — at cluster scale inputs have
    * thousands of splits and no shuffle is added; the floor only
    * engages on few-split inputs, where the repartition moves a
    * proportionally tiny payload once. Hash-distributes by `keyCol`
    * (deterministic; round-robin would pay the sort-before-repartition
    * pass and retry-instability, §2.5). */
  private[ops] def flooredParallelism(df: DataFrame,
      keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sessionState.conf.numShufflePartitions
    val floor = math.min(target, spark.sparkContext.defaultParallelism)
    // CONTRACT (r19, per review): callers must pass SCAN-ROOTED frames
    // (a projection/filter over a source read) — `df.rdd` is plan-only
    // for those; on a shuffle-bearing derived frame it would
    // materialize the upstream AQE stages whose output the subsequent
    // repartition then discards, silently doubling upstream work.
    // Every current caller passes a plain projected scan.
    if (df.rdd.getNumPartitions >= floor) df
    else df.repartition(target, df.col(keyCol))
  }

  /** PINNED-width hash distribution for exchanges whose downstream is
    * compute-dense but tiny BY BYTES (shingle/band/bucket inverted
    * indexes feeding self-joins, window doc-frequency passes, pair
    * verification): AQE's byte-based partition coalescing folds such
    * exchanges to 1-2 tasks and serializes the operator's real CPU
    * (r19 QueryProbe: a 3.2 s-wall 2-task verification stage in
    * x_setjoin_containment, a 913 ms 10-task pair join in ngramJaccard).
    * An explicit partition count (`REPARTITION_BY_NUM`) is exempt from
    * coalescing; the count is the SESSION shuffle-partition setting —
    * exactly the width an un-coalesced exchange would use at cluster
    * scale, so this pins behavior, it does not add a local-mode
    * constant. Per-task CPU stays bounded by the key's group size
    * either way. */
  private[ops] def pinnedWidth(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      cols: _*)

  /** Session tuning for ITERATIVE DataFrame loops (components, k-core
    * peel, PageRank power iteration), restored in `finally`. The loops
    * are fixed-overhead-bound at bench SF, not data-bound: under AQE
    * every shuffle of every round is its own ~100 ms stage-job plus a
    * driver re-planning pass, so a 3-shuffle round costs ~5 jobs
    * regardless of data. Two perf-only knobs for the loop's own
    * queries:
    *   - AQE off: one action = ONE job over all of the round's stages.
    *     Nothing is lost — AQE's skew splitting does not apply to the
    *     window/aggregate operators these loops run, and its partition
    *     coalescing is replaced by the next knob;
    *   - shuffle partitions derived from the measured row count
    *     (~1M compact rows per task, capped at the session setting) —
    *     scale-adaptive, NOT a local-mode constant: a big graph keeps
    *     the session's full width, a few-hundred-edge bench graph
    *     stops paying 32 near-empty tasks per stage. Iterative state
    *     only CONTRACTS (or stays fixed) round over round, so sizing
    *     from the initial count never under-provisions a later round.
    * Results are config-independent; the graph specs pin label/rank
    * equality either way. */
  private[ops] def withLoopConf[A](
      spark: org.apache.spark.sql.SparkSession, rows: Long)(body: => A): A = {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions",
      spark.sessionState.conf.numShufflePartitions.toString)
    val loopParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      (rows + 999999L) / 1000000L)).toString
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", loopParts)
      body
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe0)
      spark.conf.set("spark.sql.shuffle.partitions", parts0)
    }
  }
}
