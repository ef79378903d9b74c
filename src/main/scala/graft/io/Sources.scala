package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schemas.Schemas
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** Input sources: date discovery (S1), decimal-comma CSV (S2), the
  * Excel-adapter seam (S3/S4), and the JDBC seam (S5). SURVEY.md §2.1.
  */
object Sources {

  /** `DDMMYYYY` in filenames (reference main.py:9 `re r'(\d{8})'`). */
  private val datePattern = raw"(\d{8})".r.unanchored
  private val ddmmyyyy = DateTimeFormatter.ofPattern("ddMMyyyy")

  /** S1 — directory scan + regex date discovery (main.py:8-17).
    * Returns dates in CHRONOLOGICAL order: the reference sorts the raw
    * `DDMMYYYY` strings lexicographically (main.py:33), which misorders
    * across months (SURVEY §2.9.2) — documented fix. */
  def listUniqueDates(dir: String): Seq[String] = {
    val stream = Files.list(Paths.get(dir))
    val names =
      try stream.iterator().asScala.map(_.getFileName.toString).toSeq
      finally stream.close()
    names.collect { case datePattern(d) => d }
      .distinct
      .sortBy(d => LocalDate.parse(d, ddmmyyyy))
  }

  def parseDate(ddmmyyyyStr: String): java.sql.Date =
    java.sql.Date.valueOf(LocalDate.parse(ddmmyyyyStr, ddmmyyyy))

  /** S2 — `transactions_{date}.txt`: `;`-separated CSV with header and a
    * decimal COMMA in `amount` (main.py:103 `sep=';', decimal=','`).
    * Spark's CSV reader has no locale option, so `amount` is read as a
    * string and normalized `,`→`.` before the DecimalType(18,2) cast.
    * Output columns are the staging names (main.py:105-107 rename). */
  def readTransactionsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(Schemas.rawTransactionsCsv)
      .csv(path)
      .select(
        col("transaction_id").as("trans_id"),
        col("transaction_date").as("trans_date"),
        col("card_num"),
        col("oper_type"),
        regexp_replace(col("amount"), ",", ".")
          .cast(DecimalType(18, 2)).as("amt"),
        col("oper_result"),
        col("terminal"))

  /** Parse-time quarantine: [[readTransactionsCsv]] with PERMISSIVE
    * corrupt-record capture. A malformed line (wrong field count,
    * unparseable timestamp) must neither kill the load (FAILFAST) nor
    * silently turn into nulls (plain PERMISSIVE): it lands in the
    * quarantine frame with its raw text for reprocessing, the standard
    * ingest discipline for an unattended daily feed. Returns
    * (good, quarantined-raw-lines). One scan serves both — the split is
    * a filter on the corrupt-record column, not a second parse. Spark
    * requires the corrupt column's rows to be cached or re-parsed on
    * access from the same pass (SPARK-21610), hence the eager split on
    * a persisted parse. */
  def readTransactionsCsvQuarantined(spark: SparkSession,
                                     path: String): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      Schemas.rawTransactionsCsv.fields :+ StructField("_corrupt_record", StringType))
    val parsed = spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .persist()
    val good = parsed.filter(col("_corrupt_record").isNull)
      .select(
        col("transaction_id").as("trans_id"),
        col("transaction_date").as("trans_date"),
        col("card_num"),
        col("oper_type"),
        regexp_replace(col("amount"), ",", ".")
          .cast(DecimalType(18, 2)).as("amt"),
        col("oper_result"),
        col("terminal"))
    val bad = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    // Materialize both sides of the split eagerly and release the
    // parse cache before returning — otherwise every call leaks the
    // cached blocks for the session lifetime. localCheckpoint severs
    // the lineage too, so later reads of the returned frames can never
    // fall back to re-parsing the corrupt column (SPARK-21610).
    val goodM = good.localCheckpoint(true)
    val badM = bad.localCheckpoint(true)
    parsed.unpersist()
    (goodM, badM)
  }

  /** S3/S4 — the reference reads xlsx via pandas (main.py:98, 111). There
    * is no Spark Excel datasource in this offline build, so tabular drops
    * plug in through this adapter seam; the engine-native implementation
    * reads the CSV equivalent with an explicit schema. An Excel-backed
    * `TabularFileAdapter` can be registered without touching callers. */
  trait TabularFileAdapter {
    def read(spark: SparkSession, path: String, schema: StructType): DataFrame
  }

  /** Default adapter: header CSV with explicit schema (dates as
    * yyyy-MM-dd). Used for terminals_{date} and passport_blacklist_{date}. */
  object CsvAdapter extends TabularFileAdapter {
    def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
      spark.read
        .option("header", "true")
        .option("dateFormat", "yyyy-MM-dd")
        .schema(schema)
        .csv(path)
  }

  /** Terminals drop (main.py:98) through the adapter. */
  def readTerminals(spark: SparkSession, path: String,
                    adapter: TabularFileAdapter = CsvAdapter): DataFrame =
    adapter.read(spark, path, Schemas.stgTerminals)

  /** Blacklist drop (main.py:111-113): file cols `passport`,`date` →
    * staging `passport_num`,`entry_dt`. */
  def readBlacklist(spark: SparkSession, path: String,
                    adapter: TabularFileAdapter = CsvAdapter): DataFrame =
    adapter.read(spark, path, Schemas.rawBlacklist)
      .select(col("passport").as("passport_num"), col("date").as("entry_dt"))

  /** S5 — the reference pulls `info.clients/accounts/cards` from a live DB
    * (main.py:65-94). Connector seam: production binds a JDBC read here;
    * engine-native tests bind parquet/CSV snapshots. The projection
    * applies the reference renames (`patronymic`→`patrinymic` main.py:70,
    * `account`→`account_num` main.py:81, 91). */
  trait SourceDb {
    def clients(spark: SparkSession): DataFrame
    def accounts(spark: SparkSession): DataFrame
    def cards(spark: SparkSession): DataFrame
  }

  /** Parquet-snapshot SourceDb: `<dir>/{clients,accounts,cards}.parquet`
    * in the `info.*` source shapes (Schemas.src*). */
  final class SnapshotSourceDb(dir: String) extends SourceDb {
    def clients(spark: SparkSession): DataFrame =
      spark.read.schema(Schemas.srcClients).parquet(s"$dir/clients.parquet")
        .withColumnRenamed("patronymic", "patrinymic")
    def accounts(spark: SparkSession): DataFrame =
      spark.read.schema(Schemas.srcAccounts).parquet(s"$dir/accounts.parquet")
        .withColumnRenamed("account", "account_num")
    def cards(spark: SparkSession): DataFrame =
      spark.read.schema(Schemas.srcCards).parquet(s"$dir/cards.parquet")
        .withColumnRenamed("account", "account_num")
  }

  /** JDBC-backed SourceDb (the production binding of S5). Kept as a thin
    * factory so credentials come from config, never hard-coded (the
    * reference embeds them, main.py:36-40 — SURVEY §2.9.7). */
  final class JdbcSourceDb(url: String, props: java.util.Properties) extends SourceDb {
    private def tbl(spark: SparkSession, table: String): DataFrame =
      spark.read.jdbc(url, table, props)
    def clients(spark: SparkSession): DataFrame =
      tbl(spark, "info.clients").withColumnRenamed("patronymic", "patrinymic")
    def accounts(spark: SparkSession): DataFrame =
      tbl(spark, "info.accounts").withColumnRenamed("account", "account_num")
    def cards(spark: SparkSession): DataFrame =
      tbl(spark, "info.cards").withColumnRenamed("account", "account_num")
  }
}
