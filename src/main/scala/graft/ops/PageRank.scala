package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * sibling of [[Dedup.components]]: the same pure-DataFrame iterative
  * shape (join + aggregate per round, eager localCheckpoint truncating
  * the logical plan each round), applied to importance propagation
  * (which documents/hosts dominate a link graph — the seed-weighting
  * signal crawl-based corpus curation uses).
  *
  * All arithmetic is EXACT INT64 fixed-point at scale 10¹²: ranks
  * init to `10¹² div N`, each round distributes `pr div out_degree`
  * along edges and damps as `base + (85·Σ) div 100`. No doubles
  * anywhere, so results are independent of summation order and
  * bit-identical across engines — the property that lets the oracle
  * replay three iterations in SQL and hash-match (a floating-point
  * formulation differs in the last bits between engines and between
  * partitionings of the SAME engine). The deterministic cost: truncation
  * drops ≤1 unit (10⁻¹² of mass) per div; dangling-node mass is dropped,
  * not redistributed, identically on both sides.
  *
  * Per round: one equi-join of edges to ranks co-partitioned on the
  * source, one aggregate partitioned on the destination — shuffles
  * carry (node, long) pairs only, never adjacency payloads. O(log-free)
  * round count is caller-fixed (`iterations`), the standard
  * power-iteration contract. */
object PageRank {

  private val Scale = 1000000000000L // 10^12

  /** (id, pr_e12) after `iterations` damped rounds over the DISTINCT
    * directed edges. Node ids must be numeric (cast to long). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be positive, got $iterations")
    // one checkpointed edge projection feeds degrees, nodes, and every
    // round (the components() lesson: don't re-execute the upstream
    // pair/edge pipeline per consumer)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    // empty graph → empty result, not a driver-side division crash
    if (n == 0L) return nodes.withColumn("pr_e12", lit(0L))
    val base = (Scale * 15L / 100L) / n
    var pr = nodes.withColumn("pr", lit(Scale / n))
    // fixed-overhead-bound loop at bench SF — see [[graft.ops.withLoopConf]]
    // (r19): one job per damped round instead of one per shuffle stage.
    // Sized from |E| — the contrib join is the round's largest shuffle.
    withLoopConf(edges.sparkSession, e.count()) {
      for (_ <- 1 to iterations) {
        val contrib = e
          .join(pr, e("src") === pr("id"))
          .join(deg, Seq("src"))
          .select(col("dst"), intDiv(col("pr"), col("deg")).as("c"))
        val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("m"))
        pr = nodes.join(inSum, nodes("id") === inSum("dst"), "left")
          .select(col("id"),
            (lit(base) + intDiv(lit(85L) * coalesce(col("m"), lit(0L)), lit(100L)))
              .as("pr"))
          .localCheckpoint(true)
      }
    }
    pr.select(col("id"), col("pr").as("pr_e12"))
  }

  /** Personalized PageRank: identical damped power iteration, but ALL
    * teleport mass returns to `seeds` instead of spreading uniformly —
    * rank becomes proximity to the seed set (the "more like these"
    * expansion query: trusted-domain seeding in corpus curation,
    * account-ring expansion in fraud). Init mass and the 15% restart
    * both split `div nSeeds` across seeds only; everything else —
    * exact int64 fixed-point, per-round localCheckpoint, (node, long)
    * shuffles — is [[run]]. Non-seed nodes with no inflow hold rank 0.
    * `seeds` must be a subset of the graph's nodes (ids not in the
    * graph are counted in nSeeds but their mass escapes the graph). */
  def runPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                      seeds: DataFrame, seedCol: String,
                      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be positive, got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().localCheckpoint(true)
    val sd = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nSeeds = sd.count()
    if (nSeeds == 0L) return nodes.withColumn("pr_e12", lit(0L))
    val seeded = nodes.join(sd.withColumn("_s", lit(1)), Seq("id"), "left")
      .select(col("id"),
        when(col("_s").isNotNull, lit((Scale * 15L / 100L) / nSeeds))
          .otherwise(lit(0L)).as("base"),
        when(col("_s").isNotNull, lit(Scale / nSeeds))
          .otherwise(lit(0L)).as("pr"))
      .localCheckpoint(true)
    var pr = seeded.select(col("id"), col("pr"))
    // same fixed-overhead rationale as [[run]] — see withLoopConf (r19);
    // sized from |E|, the round's largest shuffle
    withLoopConf(edges.sparkSession, e.count()) {
      for (_ <- 1 to iterations) {
        val contrib = e
          .join(pr, e("src") === pr("id"))
          .join(deg, Seq("src"))
          .select(col("dst"), intDiv(col("pr"), col("deg")).as("c"))
        val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("m"))
        pr = seeded.join(inSum, seeded("id") === inSum("dst"), "left")
          .select(col("id"),
            (col("base") + intDiv(lit(85L) * coalesce(col("m"), lit(0L)), lit(100L)))
              .as("pr"))
          .localCheckpoint(true)
      }
    }
    pr.select(col("id"), col("pr").as("pr_e12"))
  }
}
