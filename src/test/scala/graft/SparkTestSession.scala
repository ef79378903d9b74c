package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (startup is ~5 s; per-suite
  * sessions would dominate test time). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.spark
}
