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
  *
  * Env knobs for the round-3 scale modes:
  *   - GRAFT_INCREMENTAL_REPORT=true — bound each date's fraud report to
  *     its {date-1, date} partitions instead of the reference's full
  *     history scan (Runner scaladoc documents the divergences);
  *   - GRAFT_COMPACT_DAYS=N — after the batch loop, archive SCD2 closed
  *     partitions older than N days before the newest processed date
  *     into month-compacted storage (TableCatalog.compactClosed).
  */
object RunDaily {
  /** The four SCD2 dims Runner maintains — compaction targets. */
  private val dims = Seq("dim_clients_hist", "dim_accounts_hist",
    "dim_cards_hist", "dim_terminals_hist")

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
    val cat = new TableCatalog(spark, warehouseDir)
    // capture before the run — Runner archives the input files
    val dates = Sources.listUniqueDates(inputDir).map(Sources.parseDate)
    val runner = new Runner(spark, cat,
      new Sources.SnapshotSourceDb(snapshotDir),
      incrementalReport =
        sys.env.get("GRAFT_INCREMENTAL_REPORT").exists(_.toBoolean))
    runner.run(inputDir)
    for {
      days <- sys.env.get("GRAFT_COMPACT_DAYS").map(_.toInt)
      newest <- dates.sorted(Ordering.by((_: java.sql.Date).getTime)).lastOption
    } {
      val cutoff = java.sql.Date.valueOf(newest.toLocalDate.minusDays(days))
      dims.foreach { d =>
        val n = cat.compactClosed(d, cutoff)
        if (n > 0) println(s"[daily] compacted $n closed partitions of $d")
      }
    }
    spark.stop()
  }
}
