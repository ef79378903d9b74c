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
    val (scaler, model) = fitOnSample(assembled, maxTrainRows, seed) { train =>
      val sc = new StandardScaler().setWithMean(true).setWithStd(true)
        .setInputCol("_raw").setOutputCol("_f")
        .fit(train)
      (sc, new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("_f").setPredictionCol("cluster")
        .fit(sc.transform(train)))
    }
    val scaled = scaler.transform(assembled)
    val assigned = model.transform(scaled)
    // Which clusters are "populated" is decided IN-PLAN: a tiny per-cluster
    // count aggregate collapses to a one-row broadcast joined back onto
    // every row. A driver-side collect here would force the whole
    // window-feature pipeline to execute once for the sizes and again for
    // the output — two full passes (and two shuffles) over the corpus.
    val keptDf = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_n", sum(col("_cnt")).over(Window.partitionBy()))
      .withColumn("_min", greatest(lit(2L),
        (col("_n") * minClusterFraction).cast("long")))
      .agg(collect_list(when(col("_cnt") >= col("_min"), col("cluster")))
        .as("_kept"))
    val centroidLit = typedLit(model.clusterCenters.map(_.toArray.toSeq).toSeq)
    // all-cluster fallback mirrors the previous semantics: if every
    // cluster is below the floor, score against all centroids
    val keptEff = when(size(col("_kept")) === 0,
      sequence(lit(0), lit(model.clusterCenters.length - 1)))
      .otherwise(col("_kept"))
    assigned
      .crossJoin(broadcast(keptDf))
      .withColumn("_fa", vector_to_array(col("_f")))
      .withColumn("anomaly_score",
        sqrt(array_min(transform(
          filter(
            transform(centroidLit, (c, i) => struct(i.as("i"),
              aggregate(zip_with(col("_fa"), c, (x, cc) => (x - cc) * (x - cc)),
                lit(0.0), (acc, v) => acc + v).as("d"))),
            s => array_contains(keptEff, s.getField("i"))),
          s => s.getField("d")))))
      .drop("_raw", "_f", "_fa", "_kept")
  }

  /** Run iterative fitting over a deterministic sample bounded by
    * `maxRows`: one sizing pass, then the sample is cached ONLY for the
    * duration of the fits (they traverse it many times) and unpersisted
    * before returning — a leaked cache would pin executor storage for
    * the session. */
  private[ops] def fitOnSample[M](df: DataFrame, maxRows: Long, seed: Long)
                                 (fit: DataFrame => M): M = {
    val n = df.count()
    val train = if (n <= maxRows) df
                else df.sample(withReplacement = false, maxRows.toDouble / n, seed)
    train.cache()
    try fit(train) finally train.unpersist(blocking = false)
  }
}
