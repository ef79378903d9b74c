package graft.etl

import org.apache.spark.sql.SparkSession
import graft.catalog.TableCatalog
import graft.io.Sources
import graft.schemas.Schemas

/** S6-S8 — staging load with truncate-reload semantics (reference
  * main.py:52-114): each run overwrites the six staging tables from the
  * three DB-sourced snapshots and the three date-stamped file drops.
  * Overwrite-mode parquet writes stand in for TRUNCATE + INSERT.
  */
final class StagingLoader(cat: TableCatalog, sourceDb: Sources.SourceDb) {

  /** Load all six staging tables for one date. File paths follow the
    * reference naming (main.py:98, 103, 111): the two tabular drops are
    * read from their native `.xlsx` (graft.io.XlsxAdapter, sheet names per
    * main.py:98/111) when present, falling back to a `.csv` equivalent
    * (SURVEY §2.1 S3/S4 adapter seam). */
  def loadAll(spark: SparkSession, inputDir: String, date: String): Unit = {
    cat.overwrite("stg_clients", sourceDb.clients(spark))
    cat.overwrite("stg_accounts", sourceDb.accounts(spark))
    cat.overwrite("stg_cards", sourceDb.cards(spark))

    def pick(base: String, sheet: String): (String, Sources.TabularFileAdapter) = {
      val xlsx = s"$inputDir/$base.xlsx"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(xlsx)))
        (xlsx, new graft.io.XlsxAdapter(sheet))
      else (s"$inputDir/$base.csv", Sources.CsvAdapter)
    }
    val (termPath, termAdapter) = pick(s"terminals_$date", "terminals")
    cat.overwrite("stg_terminals",
      Sources.readTerminals(spark, termPath, termAdapter))
    cat.overwrite("stg_transactions",
      Sources.readTransactionsCsv(spark, s"$inputDir/transactions_$date.txt"))
    val (blPath, blAdapter) = pick(s"passport_blacklist_$date", "blacklist")
    cat.overwrite("stg_blacklist",
      Sources.readBlacklist(spark, blPath, blAdapter))
  }
}
