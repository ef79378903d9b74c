package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search beyond sign-bit LSH (Similarity.lshTopK):
  *
  *   1. TRAIN: MLlib KMeans learns `nLists` coarse centroids over (a
  *      sample of) the corpus;
  *   2. INDEX: every vector is assigned to its nearest centroid — at rest
  *      the table is written partitioned by `ivf_cell` so a probe prunes
  *      partitions instead of scanning;
  *   3. SEARCH: a query scores only the `nProbe` nearest cells' vectors
  *      with the exact codegen'd cosine (graft.functions.VectorDot).
  *
  * Recall/cost is tuned by nLists (cell granularity) and nProbe (cells
  * scanned). At 100 TB the centroid set stays driver-small (nLists ≤ a
  * few thousand) while the scan is cut ~nProbe/nLists.
  */
object Ivf {

  final case class Index(centroids: Array[(Int, Array[Double])],
                         assigned: DataFrame)

  /** Train the coarse quantizer and assign every vector to a cell.
    * `assigned` = input columns + `ivf_cell`. Training is capped at
    * `maxTrainRows` (deterministic seeded sample): coarse centroids
    * converge on a fraction of the corpus, so the iterative fit stays
    * O(sample) while assignment remains one full-data pass — at 100 TB
    * the quantizer trains on ~100k vectors, not the corpus. */
  def build(embs: DataFrame, idCol: String, vecCol: String,
            nLists: Int, seed: Long = 42L, maxIter: Int = 8,
            maxTrainRows: Long = 100000L): Index = {
    val withVec = embs.withColumn("_v", array_to_vector(
      transform(col(vecCol), x => x.cast("double"))))
    // a coarse quantizer doesn't need convergence — a few iterations give
    // the same recall/cost trade-off at a fraction of the training time
    val model = Anomaly.fitOnSample(withVec, maxTrainRows, seed) { train =>
      new KMeans()
        .setK(nLists).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("_v").setPredictionCol("ivf_cell")
        .fit(train)
    }
    val assigned = model.transform(withVec).drop("_v")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    Index(centroids, assigned)
  }

  /** Persist the index: vectors partitioned by `ivf_cell` (so a probe's
    * `isin(cells)` filter becomes PARTITION PRUNING — non-probed cells
    * are never listed, let alone scanned), centroids in an
    * underscore-prefixed sidecar dir that Spark's file listing ignores
    * when reading the main table. */
  def writeIndexed(index: Index, path: String): Unit = {
    // cluster by the partition column before the dynamic write: one
    // file per cell and write parallelism = cells, instead of every
    // input task spraying a small file into every cell it touches.
    // PINNED count (r19, per review): a bare repartition(cols) is an
    // AQE-coalescible exchange, and per-leaf writer fan-out is
    // invisible to AQE's byte heuristic — the same rule as
    // TableCatalog.distributeByParts and the c9b fact write.
    pinnedWidth(index.assigned, col("ivf_cell")).write.mode("overwrite")
      .partitionBy("ivf_cell").parquet(path)
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("ivf_cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
  }

  /** Reopen a persisted index. `topK` over the result prunes partitions
    * instead of scanning the corpus — the at-rest form of the nProbe/
    * nLists trade. */
  def readIndexed(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(readCentroids(spark, path), spark.read.parquet(path))

  /** The sidecar decode, shared by [[readIndexed]] and [[append]] so the
    * two cannot drift apart on the sidecar schema. */
  private def readCentroids(spark: org.apache.spark.sql.SparkSession,
                            path: String): Array[(Int, Array[Double])] =
    spark.read.parquet(s"$path/_centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  /** In-plan nearest-centroid assignment: broadcast the centroid set
    * (nLists rows) against the vectors and keep the row with the
    * minimum squared euclidean distance — the same metric and
    * first-minimum tie rule as MLlib KMeans `transform`, so appended
    * vectors land in the cell the trained model would pick
    * (MlOpsSpec re-assigns the original corpus and gets the model's
    * own cells back). The argmin window keys on the caller's unique
    * `idCol` — a synthetic monotonically_increasing_id would be
    * regenerated differently on a task retry over shuffled input,
    * splitting one row's centroid copies across reducers. */
  def assignCells(centroids: Array[(Int, Array[Double])],
                  df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("ivf_cell", "_centroid"))
    val d2 = aggregate(
      zip_with(col(vecCol), col("_centroid"),
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0d), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_d2").asc, col("ivf_cell").asc)
    df.crossJoin(cdf)
      .withColumn("_d2", d2)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_centroid", "_d2", "_rn")
  }

  /** Incremental index maintenance: assign NEW vectors to the EXISTING
    * coarse centroids and append them to the at-rest layout — no
    * retrain, no rewrite of resident cells (dynamic append touches only
    * the partitions that receive rows, and the `_centroids` sidecar is
    * untouched). This is the standard IVF operations trade: centroids
    * slowly drift from the true distribution as appends accumulate, so
    * recall decays gradually and the index is REBUILT (cheap: the
    * quantizer trains on a sample) once the appended fraction is large —
    * meanwhile every probe sees new vectors immediately. */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
             newVectors: DataFrame, idCol: String, vecCol: String): Unit =
    // pinned count — same rule as writeIndexed's clustering exchange
    pinnedWidth(
      assignCells(readCentroids(spark, path), newVectors, idCol, vecCol),
      col("ivf_cell"))
      .write.mode("append").partitionBy("ivf_cell").parquet(path)

  /** The nProbe cells whose centroids are cosine-nearest to the query —
    * the driver-side probe set (centroids are ≤ nLists rows; this never
    * touches the corpus). */
  def probeCells(index: Index, query: Seq[Double], nProbe: Int): Array[Int] = {
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    index.centroids.sortBy { case (_, c) => -cos(c, query) }
      .take(nProbe).map(_._1)
  }

  /** Exact-cosine top-k over the nProbe nearest cells only. */
  def topK(index: Index, idCol: String, vecCol: String,
           query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cells = probeCells(index, query, nProbe)
    index.assigned
      .filter(col("ivf_cell").isin(cells.toIndexedSeq: _*))
      .select(col(idCol),
        (Similarity.dot(col(vecCol), typedLit(query)) /
          (Similarity.norm(col(vecCol)) * math.sqrt(query.map(x => x * x).sum)))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF+PQ — the standard billion-scale ANN composition: the coarse
    * quantizer prunes the scan to nProbe cells (partition pruning on a
    * persisted index), PQ ADC ranks the candidates with m table lookups
    * per row (no vector arithmetic touches the scan), and only the
    * `shortlist` ADC-best rows pay an exact cosine for the final
    * re-rank. Cost per query at 100 TB: read nProbe/nLists of the
    * corpus as integer codes, one TakeOrdered, then exact math on a
    * driver-small shortlist — the full-precision vectors of non-
    * shortlisted rows are never needed, which is what makes a
    * codes-only at-rest layout (vectors elsewhere) viable. */
  def topKIvfPq(index: Index, codebooks: Array[Array[Array[Double]]],
                idCol: String, vecCol: String, query: Seq[Double],
                k: Int, nProbe: Int, shortlist: Int = 50): DataFrame = {
    val cells = probeCells(index, query, nProbe)
    val cand = index.assigned.filter(col("ivf_cell").isin(cells.toIndexedSeq: _*))
    val short = Pq.topK(Pq.encode(cand, vecCol, codebooks),
      idCol, "pq_code", codebooks, query, shortlist)
    short.select(col(idCol),
      (Similarity.dot(col(vecCol), typedLit(query)) /
        (Similarity.norm(col(vecCol)) * math.sqrt(query.map(x => x * x).sum)))
        .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
