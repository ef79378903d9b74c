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
    * holding fewer than `minClusterFraction` of the rows are excluded
    * from scoring, because with enough k an extreme outlier captures its
    * own centroid and would score ~0 (the classic distance-to-centroid
    * blind spot); a vanishingly small cluster is itself the anomaly.
    * Output = input + `cluster`, `anomaly_score`.
    *
    * Training is capped at `maxTrainRows` (deterministic seeded sample):
    * the scaler moments and centroids converge on a fraction of the data,
    * so iterative fitting stays O(sample) while assignment and scoring
    * remain full-data single passes — the property that keeps this
    * operator viable at 100 TB (training cost no longer scales with the
    * corpus). */
  def score(featured: DataFrame, featureCols: Seq[String], k: Int = 8,
            seed: Long = 42L, minClusterFraction: Double = 0.02,
            maxIter: Int = 10, maxTrainRows: Long = 100000L): DataFrame = {
    val assembled = featured.withColumn("_raw", array_to_vector(
      array(featureCols.map(c => col(c).cast("double")): _*)))
    val train = sampleForTraining(assembled, maxTrainRows, seed)
    val scaler = new StandardScaler().setWithMean(true).setWithStd(true)
      .setInputCol("_raw").setOutputCol("_f")
      .fit(train)
    val scaled = scaler.transform(assembled)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("_f").setPredictionCol("cluster")
      .fit(scaler.transform(train))
    val assigned = model.transform(scaled)
    val sizes = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    val minSize = math.max(2L, (n * minClusterFraction).toLong)
    val kept = model.clusterCenters.zipWithIndex
      .filter { case (_, i) => sizes.getOrElse(i, 0L) >= minSize }
    val centroids = (if (kept.nonEmpty) kept else model.clusterCenters.zipWithIndex)
      .map(_._1.toArray.toSeq).toSeq
    val centroidLit = typedLit(centroids)
    assigned
      .withColumn("_fa", vector_to_array(col("_f")))
      .withColumn("anomaly_score",
        sqrt(array_min(transform(centroidLit, c =>
          aggregate(zip_with(col("_fa"), c, (x, cc) => (x - cc) * (x - cc)),
            lit(0.0), (acc, v) => acc + v)))))
      .drop("_raw", "_f", "_fa")
  }

  /** Deterministic training sample bounded by `maxRows`: one count pass
    * sizes the fraction, the seeded sample keeps the result reproducible.
    * Returns the input unchanged when it already fits (and caches the
    * training side, which both `fit` passes traverse repeatedly). */
  private[ops] def sampleForTraining(df: DataFrame, maxRows: Long,
                                     seed: Long): DataFrame = {
    val n = df.count()
    val t = if (n <= maxRows) df
            else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
    t.cache()
  }
}
