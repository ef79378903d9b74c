package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.TestdataQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One named query per implemented SURVEY §2 operator (plus the scale
  * extensions), each backed by the engine operators in graft.etl /
  * graft.rules / graft.ops, with DuckDB oracle SQL where expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full fraud pipeline (star flatten + all five rules + report
    * assembly) on the events-derived world. */
  def entry(spark: SparkSession): DataFrame =
    queries("c9_fraud_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TestdataQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-function-based operators
    * (xxhash64 / LSH / mapPartitions plumbing) → rows-only check. */
  def oracleSql: Map[String, String] =
    TestdataQueries.oracleSql
}
