package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Runner
import graft.catalog.TableCatalog
import graft.io.Sources

/** The daily-batch entry point — the engine analog of the reference's
  * only true entry point, the 08:00 cron line (main.cron:1 →
  * `python3 ./main.py`): discover every date-stamped drop in `inputDir`
  * and run the full per-date pipeline (staging → archive → SCD2 merges →
  * fact loads → fraud report) into the `warehouseDir` parquet catalog.
  *
  * Usage: runMain graft.tools.RunDaily <inputDir> <warehouseDir> <sourceSnapshotDir>
  *
  * `sourceSnapshotDir` holds the `info.*` master-data snapshots
  * (clients/accounts/cards parquet — Sources.SnapshotSourceDb). A
  * production deployment binds Sources.JdbcSourceDb here instead, with
  * credentials from config (never hard-coded — the reference embeds them,
  * main.py:36-40, SURVEY §2.9.7). Schedule with any cron runner, e.g.
  * `0 8 * * * spark-submit --class graft.tools.RunDaily ...` to mirror
  * main.cron:1.
  */
object RunDaily {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: RunDaily <inputDir> <warehouseDir> <sourceSnapshotDir>")
    val Array(inputDir, warehouseDir, snapshotDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-daily")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runner = new Runner(spark, new TableCatalog(spark, warehouseDir),
      new Sources.SnapshotSourceDb(snapshotDir))
    runner.run(inputDir)
    spark.stop()
  }
}
