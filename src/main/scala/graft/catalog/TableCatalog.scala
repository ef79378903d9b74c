package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Path-convention parquet table catalog.
  *
  * The reference's storage engine is PostgreSQL heap tables
  * (reference main.ddl); our tables are parquet directories under a root.
  * Write semantics map the reference's statement mix:
  *
  *   - TRUNCATE + reload (main.py:53-55)  → `overwrite`
  *   - INSERT append (main.py:397-408)    → `append`
  *   - UPDATE-in-place for SCD2 (main.py:142-160) has no parquet analog →
  *     `replaceAtomic`: write the new version to a temp dir, then swap.
  *     The swap is the atomicity unit, replacing the reference's
  *     commit-per-statement (main.py:55, 197).
  *
  * At cluster scale the same calls target an object store; facts are
  * date-partitioned so reprocessing a date is an idempotent dynamic
  * partition overwrite (SURVEY.md §7.4), unlike the reference's blind
  * append (main.py:397-408).
  */
final class TableCatalog(val spark: SparkSession, val root: String) {

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = {
    val p = Paths.get(path(table))
    if (!Files.exists(p)) false
    else {
      val s = Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
  }

  /** Read a table; if absent, an empty DataFrame with the given schema —
    * mirrors the reference's emptiness probe branch (main.py:125). */
  def readOrEmpty(table: String, schema: StructType): DataFrame =
    if (exists(table)) spark.read.schema(schema).parquet(path(table))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  /** TRUNCATE+reload semantics (main.py:53-55 + the staging loads). */
  def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(table))

  /** INSERT append semantics (main.py:382-410). */
  def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(table))

  /** Idempotent per-date fact load: partition by `partCol`, overwrite only
    * the partitions present in `df`. Fixes reference quirk SURVEY §2.9.5
    * (blind append would duplicate on reprocess) with identical output for
    * the once-per-date flow. */
  def appendPartitioned(table: String, df: DataFrame, partCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path(table))

  /** Bucketed overwrite for co-located joins: rows are repartitioned to
    * ONE file per bucket, hashed by `bucketCol` and sorted within each,
    * so two tables bucketed the same way join with NO shuffle; the
    * per-query Sort also disappears when the scan trusts the bucket
    * sort order (Spark ≥3 requires
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, valid
    * only with single-file buckets — which this layout guarantees).
    * TableCatalogSpec asserts both plans.
    *
    * Cost model: the write shuffles into exactly `buckets` tasks, each
    * materializing one whole bucket — size `buckets` to the parallelism
    * the table's JOINS should run at (hundreds-plus on a cluster), not
    * to a file-count aesthetic; a tiny bucket count caps both the write
    * and every subsequent co-located join.
    * Bucketing metadata lives in the session catalog under a name
    * scoped to this catalog's root — two catalogs in one session don't
    * cross-wire; read back via [[readBucketed]] (a plain parquet read
    * of the path would lose the co-partitioning guarantee). */
  def overwriteBucketed(table: String, df: DataFrame, bucketCol: String,
                        buckets: Int): Unit = {
    val name = bucketedName(table)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .option("path", path(table))
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)
  }

  def readBucketed(table: String): DataFrame =
    spark.table(s"`${bucketedName(table)}`")

  /** Drop the session-catalog entry (files at `path(table)` remain —
    * same external-table lifecycle as the rest of this catalog). */
  def dropBucketed(table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `${bucketedName(table)}`")

  /** Session-catalog identifier for a bucketed table, scoped by the
    * catalog root so same-named tables of different catalogs coexist —
    * the sanitized root itself (not a hash, which could collide and
    * silently cross-wire) is the scope; restricted to identifier-safe
    * characters because it crosses into SQL-parsed territory (the
    * path-only methods have no such limit). */
  private def bucketedName(table: String): String = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"bucketed table name must be [A-Za-z0-9_]+, got '$table'")
    s"graft_${table}_${root.replaceAll("[^A-Za-z0-9]", "_")}"
  }

  /** Full SCD2 history = open slice ∪ effective_to-partitioned closed
    * history. The open table is small (one row per live key) and swapped
    * per batch; closed partitions are immutable after their date. Reading
    * the union restores `effective_to` from the partition directory. */
  def readScd2(base: String, schema: StructType): DataFrame = {
    val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
    readOrEmpty(s"${base}_open", schema).select(cols: _*)
      .unionByName(readOrEmpty(s"${base}_closed", schema).select(cols: _*))
  }

  /** Full-rewrite with atomic swap — the SCD2 dim "UPDATE" path
    * (SURVEY.md §7.4). The new content is materialized to `<table>.tmp`
    * first, so a mid-write failure leaves the current table intact; the
    * directory move is the commit point. */
  def replaceAtomic(table: String, df: DataFrame): Unit = {
    val tmp = Paths.get(path(table) + ".tmp")
    val dst = Paths.get(path(table))
    deleteRecursive(tmp)
    df.write.mode("overwrite").parquet(tmp.toString)
    val old = Paths.get(path(table) + ".old")
    deleteRecursive(old)
    if (Files.exists(dst)) Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
  }

  private def deleteRecursive(p: Path): Unit = TableCatalog.deleteRecursively(p)
}

object TableCatalog {
  /** Recursive delete with the walk stream closed (an unclosed
    * Files.walk leaks a directory handle per call). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
