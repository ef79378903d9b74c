package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the density/community
  * primitive (clustering coefficients, spam-graph features) that sits
  * beside [[PageRank]] on the graph surface.
  *
  * Scale design: the naive three-way edge self-join explodes on high-
  * degree vertices (a degree-d hub contributes d² wedges). The standard
  * fix — orient every edge from its lower-(degree, id) endpoint to its
  * higher one, then enumerate wedges only between ORIENTED out-edges —
  * bounds every vertex's out-degree by O(√m) on any graph, so the wedge
  * join is skew-safe without salting. Each triangle is counted exactly
  * once (its lowest-ordered vertex owns it); per-vertex counts explode
  * each triangle to its three corners and aggregate. Three shuffles
  * total: degrees, the wedge join, the closing-edge join — each keyed
  * on a vertex or an edge, never on anything wider.
  */
object Triangles {

  /** Undirected co-occurrence edges (a < b) between items sharing a
    * group: items are vertices; an edge exists when two items co-occur
    * in at least `minCount` groups, weighted by that count. The pair
    * generator is a per-group self-join on the DISTINCT (group, item)
    * projection — quadratic only in a group's item count, which domain
    * grouping keys (an order's line items, a session's pages) keep
    * small; the distinct collapses duplicate memberships first. */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        minCount: Long = 1L): DataFrame = {
    val gi = df.select(col(groupCol).as("_g"), col(itemCol).as("_i")).distinct()
    gi.as("l").join(gi.as("r"),
        col("l._g") === col("r._g") && col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("a"), col("r._i").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
  }

  /** Per-vertex triangle participation counts over an (a, b) edge list
    * with a < b (undirected, no duplicates). Returns (vertex, n_tri)
    * for vertices in at least one triangle. */
  def perVertexCounts(edges: DataFrame): DataFrame = {
    // the edge list feeds FOUR subtrees (degrees, both wedge sides, the
    // closing probe); an upstream generator — a co-occurrence self-join,
    // a knn pipeline — would otherwise execute once per consumer. The
    // eager localCheckpoint materializes it exactly once (the
    // Dedup.components convention).
    val e = edges.select(col("a").cast("long"), col("b").cast("long"))
      .localCheckpoint(true)
    // total degree per vertex — the orientation key
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient each edge from lower (deg, id) to higher; src out-degree
    // is then O(√m)-bounded regardless of the raw degree distribution
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
    // wedges between two out-edges of one src; the closing edge is
    // undirected, so probe the original a<b list with the sorted pair
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("u"),
        least(col("e1.dst"), col("e2.dst")).as("x"),
        greatest(col("e1.dst"), col("e2.dst")).as("y"))
    val tris = wedges.join(e,
      col("x") === col("a") && col("y") === col("b"))
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("vertex"))
      .groupBy(col("vertex")).agg(count(lit(1)).as("n_tri"))
  }
}
