package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over plain parquet directories — the
  * manifest half of the lakehouse pattern [[ZOrder]] clusters for.
  *
  * Spark prunes files by PARTITION VALUES only; per-file column
  * statistics live in parquet footers and are consulted per row-group
  * at read time, after every file is already opened. A persisted
  * manifest (one row per file: min/max of the skip columns) moves that
  * decision before the scan: a range probe consults the manifest —
  * thousands of rows for a 100 TB table — and opens only intersecting
  * files. On a z-clustered layout both dimensions have tight per-file
  * envelopes, so a 2-D box touches few files; on a 1-D-sorted layout
  * only that dimension prunes (DataSkippingSpec measures both).
  *
  * Build the manifest ONCE at write time and persist it beside the
  * table — `TableCatalog.overwriteIndexed` folds it into the
  * `_stats.json` sidecar (one ANALYZE pass, one freshness rule, shared
  * with join planning), and `TableCatalog.prunedRead` reads back
  * through it; rebuilding per query would re-scan the table and defeat
  * the point. The DataFrame-level helpers here remain for ad-hoc use
  * over directories outside the catalog (DataSkippingSpec measures the
  * pruning payoff with them). */
object DataSkipping {

  /** Per-file min/max statistics of `cols` plus row count — one output
    * row per file, computed in a single scan. */
  def manifest(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read only the files whose [min, max] envelope intersects EVERY
    * closed range, then re-apply the row-level predicate. Equality with
    * the unpruned filtered scan is the correctness contract — a wrongly
    * skipped file would lose rows, and `x_skipping_read`'s oracle is
    * exactly that unpruned scan. Only file NAMES pass through the
    * driver (one per surviving file — the centroid-sidecar pattern). */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
                 ranges: Seq[(String, Long, Long)]): DataFrame = {
    val keep = ranges.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }
    val files = keep.select(col("file")).collect().map(_.getString(0))
    // basePath keeps Hive partition columns alive when reading leaf
    // files directly, so both branches expose the table's full schema
    // and ranges on partition columns keep working
    val base = if (files.isEmpty) spark.read.parquet(path).limit(0)
               else spark.read.option("basePath", path)
                 .parquet(files.toIndexedSeq: _*)
    ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
