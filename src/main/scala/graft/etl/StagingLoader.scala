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
    * reference naming (main.py:98, 103, 111) with the engine-native CSV
    * equivalents for the two xlsx drops (SURVEY §2.1 S3/S4). */
  def loadAll(spark: SparkSession, inputDir: String, date: String): Unit = {
    cat.overwrite("stg_clients", sourceDb.clients(spark))
    cat.overwrite("stg_accounts", sourceDb.accounts(spark))
    cat.overwrite("stg_cards", sourceDb.cards(spark))
    cat.overwrite("stg_terminals",
      Sources.readTerminals(spark, s"$inputDir/terminals_$date.csv"))
    cat.overwrite("stg_transactions",
      Sources.readTransactionsCsv(spark, s"$inputDir/transactions_$date.txt"))
    cat.overwrite("stg_blacklist",
      Sources.readBlacklist(spark, s"$inputDir/passport_blacklist_$date.csv"))
  }
}
