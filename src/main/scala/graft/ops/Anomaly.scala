package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.StandardScaler
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-backed anomaly scoring over the transaction stream — the
  * unsupervised companion to the five deterministic fraud rules
  * (rules.FraudRules): feature engineering in pure DataFrame ops, KMeans
  * clustering, distance-to-centroid as the anomaly score.
  *
  * Features per transaction (all computed with one window partitioning on
  * the entity key — single shuffle):
  *   - amount z-score within the entity's own history;
  *   - seconds since the entity's previous transaction (velocity);
  *   - hour-of-day.
  */
object Anomaly {

  /** Adds `amt_z`, `gap_s`, `hour` to `txns(entityCol, tsCol, amtCol)`.
    * `tieCols` extends the lag ordering beyond the timestamp — equal
    * timestamps within an entity otherwise make `gap_s` nondeterministic
    * (same fix as the reference's row_number ties, SURVEY §2.9.3). */
  def features(txns: DataFrame, entityCol: String, tsCol: String,
               amtCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val byEntity = Window.partitionBy(entityCol)
    val ordered = byEntity.orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val mean = avg(col(amtCol)).over(byEntity)
    val sd = stddev_pop(col(amtCol)).over(byEntity)
    txns
      .withColumn("amt_z",
        when(sd > 0, (col(amtCol) - mean) / sd).otherwise(lit(0.0)))
      .withColumn("gap_s",
        coalesce(unix_timestamp(col(tsCol)) -
          lag(unix_timestamp(col(tsCol)), 1).over(ordered), lit(0L))
          .cast("double"))
      .withColumn("hour", hour(col(tsCol)).cast("double"))
  }

  /** KMeans over standardized features; score = L2 distance (in
    * standardized space) to the nearest POPULATED centroid — clusters
    * holding fewer than `minClusterFraction` of the training rows are
    * excluded from scoring, because with enough k an extreme outlier
    * captures its own centroid and would score ~0 (the classic
    * distance-to-centroid blind spot); a vanishingly small cluster is
    * itself the anomaly. Output = input + `cluster`, `anomaly_score`.
    *
    * Training is capped at `maxTrainRows`: the scaler moments and
    * centroids converge on a fraction of the data, so iterative fitting
    * stays O(sample) while assignment and scoring remain ONE full-data
    * pass — the property that keeps this operator viable at 100 TB.
    * Pass `inputRows` (a cheap count of the un-featured base table —
    * parquet row-count metadata) so the sample fraction is sized without
    * executing the window-feature lineage an extra time; see
    * [[fitOnSample]] for the fallback.
    *
    * Populated-cluster selection reads the fit's own training summary
    * (cluster sizes over the cached sample — already on the executors,
    * one cheap job, no re-execution of the feature lineage) rather than
    * re-counting the full data: the 2% floor is a statistical threshold,
    * and the training sample is exactly the distribution the centroids
    * were fit on. This also makes the kept set a driver-side constant,
    * immune to any nondeterminism between two executions of an uncached
    * lineage (ADVICE r2). The kept centroids are inlined as a literal —
    * no broadcast join, nothing recomputed. */
  def score(featured: DataFrame, featureCols: Seq[String], k: Int = 8,
            seed: Long = 42L, minClusterFraction: Double = 0.02,
            maxIter: Int = 10, maxTrainRows: Long = 100000L,
            inputRows: Option[Long] = None): DataFrame = {
    val assembled = featured.withColumn("_raw", array_to_vector(
      array(featureCols.map(c => col(c).cast("double")): _*)))
    val (scaler, model, kept) =
      fitOnSample(assembled, maxTrainRows, seed, inputRows) { train =>
        val sc = new StandardScaler().setWithMean(true).setWithStd(true)
          .setInputCol("_raw").setOutputCol("_f")
          .fit(train)
        val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
          .setFeaturesCol("_f").setPredictionCol("cluster")
          .fit(sc.transform(train))
        // summary.clusterSizes runs one aggregate over the CACHED sample
        // — must be read here, while the cache is alive
        val sizes = km.summary.clusterSizes.map(_.toLong)
        val floor = math.max(2L, (sizes.sum * minClusterFraction).toLong)
        val kept0 = sizes.zipWithIndex.collect { case (s, i) if s >= floor => i }
        // all-cluster fallback: if every cluster is below the floor,
        // score against all centroids
        (sc, km, if (kept0.isEmpty) sizes.indices.toSeq else kept0.toSeq)
      }
    val scaled = scaler.transform(assembled)
    val assigned = model.transform(scaled)
    val keptCentroids = typedLit(kept.map(i => model.clusterCenters(i).toArray.toSeq))
    assigned
      .withColumn("_fa", vector_to_array(col("_f")))
      .withColumn("anomaly_score",
        sqrt(array_min(transform(keptCentroids, c =>
          aggregate(zip_with(col("_fa"), c, (x, cc) => (x - cc) * (x - cc)),
            lit(0.0), (acc, v) => acc + v)))))
      .drop("_raw", "_f", "_fa")
  }

  /** Run iterative fitting over a deterministic sample bounded by
    * `maxRows`. The sample is cached ONLY for the duration of the fits
    * (they traverse it many times) and unpersisted before returning — a
    * leaked cache would pin executor storage for the session.
    *
    * Sizing (VERDICT r2 #6): when the caller knows the row count
    * (`inputRows` — e.g. a metadata-cheap count of the raw base table),
    * the Bernoulli fraction is derived from it and `df`'s lineage is
    * never executed for sizing. Without it, the fallback counts `df`
    * itself — the right call when `df` is a cheap projection (Ivf trains
    * straight over the embedding scan), but wasteful when it carries a
    * window pipeline (Anomaly.score passes the base count instead). */
  private[ops] def fitOnSample[M](df: DataFrame, maxRows: Long, seed: Long,
                                  inputRows: Option[Long] = None)
                                 (fit: DataFrame => M): M = {
    val n = inputRows.getOrElse(df.count())
    val train = if (n <= maxRows) df
                else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
    train.cache()
    try fit(train) finally train.unpersist(blocking = false)
  }
}
