package graft

import org.apache.spark.sql.SparkSession
import graft.catalog.TableCatalog
import graft.etl.{FactLoader, Scd2, StagingLoader}
import graft.io.{Archiver, Sources}
import graft.report.FraudReport
import graft.rules.FraudRules
import graft.schemas.Schemas

/** §3.1 — the per-date batch loop (reference main.py:48-561): discover
  * date-stamped drops, then per date load staging, archive the files,
  * merge SCD2 dims, append facts, and append the fraud report.
  *
  * Dates run in CHRONOLOGICAL order (the reference's lexicographic
  * DDMMYYYY sort misorders across months — fix per SURVEY §2.9.2).
  * Atomicity: the reference commits per statement; here each dim swap
  * (TableCatalog.replaceAtomic) and each fact/report write-job is the
  * unit. Facts and the report are partitioned/appended per date so a rerun
  * of one date is idempotent (SURVEY §7.4).
  */
final class Runner(spark: SparkSession, cat: TableCatalog,
                   sourceDb: Sources.SourceDb,
                   incrementalReport: Boolean = false,
                   onBeforeReport: () => Unit = () => ()) {

  private val staging = new StagingLoader(cat, sourceDb)

  def run(inputDir: String): Unit =
    Sources.listUniqueDates(inputDir).foreach(d => runDate(inputDir, d))

  def runDate(inputDir: String, dateStr: String): Unit = {
    val date = Sources.parseDate(dateStr)

    // 1. Staging truncate-reload (main.py:52-114).
    staging.loadAll(spark, inputDir, dateStr)
    // 2. Archive this date's input files (main.py:117).
    Archiver.filesToArchive(inputDir, dateStr)

    // 3. SCD2 merges (main.py:121-379) against the OPEN slice only —
    // closed history is never re-read or rewritten (O(current) per batch,
    // SURVEY §7.4). Newly closed rows land in an effective_to-partitioned
    // table first (dynamic overwrite → rerunning a date replaces its own
    // partition), then the open slice swaps atomically.
    def mergeDim(table: String, stgTable: String, spec: Scd2.DimSpec,
                 schema: org.apache.spark.sql.types.StructType): Unit = {
      val openRaw = cat.readOrEmpty(s"${table}_open", schema)
      // ANALYZE the day's staging snapshot (one agg job over the drop —
      // O(drop), not O(history)) so the merge below and any later
      // consumer plan from persisted facts about THIS load.
      cat.analyze(stgTable)
      val stgRaw = cat.read(stgTable)
      // Pre-size the SCD2 merge join from the System-R estimate
      // (VERDICT r8 next #3): the open slice carries stats from the
      // PREVIOUS date's post-merge analyze (still fresh — we swap it
      // only below), staging was analyzed just now. When both sides
      // have fresh stats the merge shuffle runs at a width proportional
      // to estimated join output instead of the static session default —
      // the decision a 1000-executor cluster needs before the first
      // exchange materializes. First date (no open stats) or any
      // staleness → untouched inputs, the pre-stats behavior.
      val (open, stg) = cat.plannedShufflePartitions(
          s"${table}_open", spec.key, stgTable, spec.key) match {
        case Some(n) =>
          (openRaw.repartition(n, openRaw(spec.key)),
           stgRaw.repartition(n, stgRaw(spec.key)))
        case None => (openRaw, stgRaw)
      }
      val (newOpen, closedNow) = Scd2.mergeOpen(open, stg, spec, date)
      cat.appendPartitioned(s"${table}_closed", closedNow, "effective_to")
      cat.replaceAtomic(s"${table}_open", newOpen)
      // ANALYZE the fresh snapshot (one agg job over the small open
      // slice) so the report's dim joins below are hinted from persisted
      // stats at the right version, not Spark's 10 MB filesize default.
      cat.analyze(s"${table}_open")
    }
    mergeDim("dim_clients_hist", "stg_clients", Scd2.clients, Schemas.dimClientsHist)
    mergeDim("dim_accounts_hist", "stg_accounts", Scd2.accounts, Schemas.dimAccountsHist)
    mergeDim("dim_cards_hist", "stg_cards", Scd2.cards, Schemas.dimCardsHist)
    mergeDim("dim_terminals_hist", "stg_terminals", Scd2.terminals, Schemas.dimTerminalsHist)

    // 4. Fact loads (main.py:382-410). Transactions are load-date
    // partitioned: reprocessing a date dynamic-overwrites its own
    // partition instead of duplicating (fixes quirk §2.9.5 with identical
    // output for the once-per-date flow). Blacklist append is already
    // idempotent via the anti-join.
    val blExisting = cat.readOrEmpty("fact_passport_blacklist", Schemas.factPassportBlacklist)
    cat.append("fact_passport_blacklist",
      FactLoader.blacklistRows(cat.read("stg_blacklist"), blExisting))
    cat.appendPartitioned("fact_transactions",
      FactLoader.transactionRows(cat.read("stg_transactions"))
        .withColumn("load_dt", org.apache.spark.sql.functions.lit(date)),
      "load_dt")

    onBeforeReport()

    // 5. Fraud report (main.py:414-561). Every consumer filters
    // deleted_flg = false, which on this layout IS the open slice — so the
    // rules read only the small open tables, no closed-history scan.
    //
    // Full mode mirrors the reference exactly: the report query scans the
    // ENTIRE accumulated fact every date (main.py:544 has no date filter),
    // re-reporting historical frauds each run — O(history) per batch.
    //
    // Incremental mode bounds that scan: the rule inputs read only the
    // load_dt ∈ {date-1, date} partitions (partition-pruned — the
    // cross-city window spans ≤ 1 h and the brute-force window looks
    // ≤ 20 min FORWARD from a start txn, so for this batch's transactions
    // every rule partner lives in yesterday's or today's drop). The
    // report covers this date's partition PLUS yesterday's final hour —
    // the "late edge" whose rule windows were still open at yesterday's
    // run (a brute-force START at 23:45 completed by today's 00:03
    // partner, or the yesterday leg of a cross-midnight city pair,
    // becomes detectable only today, and rule 5 flags the start txn, so
    // without the edge those frauds would NEVER be reported) — with an
    // anti-join against yesterday's report partition (partition-pruned,
    // one small slice) so edge rows already reported yesterday don't
    // repeat. Per-date output for the date's own partition equals the
    // full scan's rows for this date (oracle query
    // c9b_fraud_pipeline_incremental pins the bounded rule-scan
    // equality; the edge + anti-join path is pinned by
    // IncrementalReportSpec) under the reference's feed contract: each
    // daily drop carries that day's transactions.
    //
    // Scope of the guarantee, precisely: every fraud DETECTABLE FROM THE
    // TRANSACTIONS (rule-window completion — a partner or the 4th
    // attempt arriving the next day) is reported exactly once, at the
    // date it becomes detectable. Per-transaction rules (blacklist,
    // expiry) are evaluated at the transaction's own batch against that
    // batch's reference data — a blacklist entry or dim correction
    // arriving AFTER a transaction's batch does not retro-flag old
    // partitions here (the full scan, re-reporting all history daily,
    // does); that is a reference-data backfill, and full mode (or a
    // dated rerun) is the backfill tool. Multi-day reprocessing must
    // replay dates in order.
    import org.apache.spark.sql.functions.{col, date_sub, expr, lit}
    val txnAll = cat.read("fact_transactions")
    val txn =
      if (incrementalReport)
        txnAll.filter(col("load_dt").between(date_sub(lit(date), 1), lit(date)))
      else txnAll
    // Dims read with the stats-driven broadcast hint (analyzed at merge
    // time above): a dim that stats prove small hash-builds regardless
    // of Spark's filesize threshold; one that outgrew the bound (or
    // whose stats are stale) degrades to the planner's own choice.
    val cards = cat.readOrEmptyHinted("dim_cards_hist_open", Schemas.dimCardsHist)
    val accounts = cat.readOrEmptyHinted("dim_accounts_hist_open", Schemas.dimAccountsHist)
    val clients = cat.readOrEmptyHinted("dim_clients_hist_open", Schemas.dimClientsHist)
    val terminals = cat.readOrEmptyHinted("dim_terminals_hist_open", Schemas.dimTerminalsHist)
    val blacklist = cat.read("fact_passport_blacklist")

    val withClient = FraudRules.txnWithClient(txn, cards, accounts, clients)
    val cityTxn = FraudRules.cityOfTransactions(withClient, terminals)
    val rule4 = FraudRules.crossCityRule(cityTxn)
    val rule5 = FraudRules.bruteForceRule(withClient)
    // Rule sets see the two-day slice; the report rows cover this date's
    // partition plus yesterday's late edge (see the mode comment above).
    val report =
      if (incrementalReport) {
        // midnight derived IN-PLAN (date → timestamp uses the session
        // time zone, like every trans_date in the pipeline) — building
        // it via java.sql.Timestamp would bake in the driver JVM's
        // default zone and shift the edge window wherever the two differ
        val reportBase = txn.filter(col("load_dt") === lit(date) ||
          (col("load_dt") === date_sub(lit(date), 1) &&
            col("trans_date") >=
              lit(date).cast("timestamp") - expr("INTERVAL 1 HOUR")))
        val assembled = FraudReport.assemble(reportBase, cards, accounts,
          clients, blacklist, rule4, rule5, date)
        // drop edge rows already reported yesterday (null-safe compare:
        // a left-joined passport/fio/phone can be NULL). If a dim
        // attribute changed overnight the row re-reports with the new
        // value — exactly what the full scan does too (GoldenEndToEndSpec
        // pins that reference behavior).
        // Yesterday's partition is consulted only if yesterday COMMITTED
        // (its date marker landed): an uncommitted — crashed-mid-date —
        // predecessor may hold a partial report partition, and an
        // anti-join against half a day would suppress rows arbitrarily.
        // Replaying dates in order (the documented reprocessing
        // contract) rewrites and commits yesterday first, so in the
        // normal sequential flow this filter is a no-op.
        val prevDate = java.sql.Date.valueOf(date.toLocalDate.minusDays(1))
        val prev =
          if (Runner.isDateCommitted(cat, prevDate))
            cat.readOrEmpty("rep_fraud", Schemas.repFraud)
              .filter(col("report_dt") === date_sub(lit(date), 1))
          else cat.readOrEmpty("rep_fraud", Schemas.repFraud).limit(0)
        assembled.as("n").join(prev.as("p"),
          col("n.event_dt") <=> col("p.event_dt") &&
            col("n.passport") <=> col("p.passport") &&
            col("n.fio") <=> col("p.fio") &&
            col("n.phone") <=> col("p.phone") &&
            col("n.event_type") <=> col("p.event_type"),
          "left_anti")
      } else
        FraudReport.assemble(txn, cards, accounts, clients,
          blacklist, rule4, rule5, date)
    cat.appendPartitioned("rep_fraud", report, "report_dt")

    // 6. Publish marker (VERDICT r6 next #5): the date is COMMITTED only
    // once its report partition has landed — the last write of the batch.
    // A crash anywhere above leaves this date's fact/report partitions
    // (possibly partial) on disk but invisible to the marker-aware read
    // path ([[Runner.publishedRead]]); the rerun's dynamic per-partition
    // overwrites rewrite exactly those partitions and then commit.
    // Reference fidelity is untouched: direct reads (what the reference's
    // consumers do) see identical bytes; the marker is an ADDITIVE
    // publish protocol for consumers that want never-partial dates.
    cat.putMarker(Runner.dateCommitMarker(date), date.toLocalDate.toEpochDay)
  }
}

object Runner {
  /** Marker table-name for one ingest date's publish commit. Lives under
    * `_commits/` at the catalog root — outside every data table's
    * directory, so partition discovery never sees it. */
  def dateCommitMarker(date: java.sql.Date): String = s"_commits/$date"

  def isDateCommitted(cat: TableCatalog, date: java.sql.Date): Boolean =
    cat.getMarker(dateCommitMarker(date)).isDefined

  /** Every date whose runDate completed through its report write. */
  def committedDates(cat: TableCatalog): Seq[java.sql.Date] = {
    val dir = java.nio.file.Paths.get(cat.path("_commits"))
    if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => cat.getMarker(s"_commits/$n").isDefined)
        .map(java.sql.Date.valueOf).toSeq.sortBy(_.toLocalDate.toEpochDay)
      finally s.close()
    }
  }

  /** Marker-aware read of a date-partitioned pipeline table: rows of
    * uncommitted (crashed-mid-publish) dates are absent. The IN-filter is
    * on the partition column with a literal list → partition-pruned at
    * the scan; committed-date count is O(days), driver-side tiny. */
  def publishedRead(cat: TableCatalog, table: String, partCol: String)
  : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val dates = committedDates(cat)
    if (!cat.exists(table)) cat.spark.emptyDataFrame
    else if (dates.isEmpty) cat.read(table).limit(0)
    else cat.read(table).filter(col(partCol).isin(dates: _*))
  }

  def publishedTransactions(cat: TableCatalog): org.apache.spark.sql.DataFrame =
    publishedRead(cat, "fact_transactions", "load_dt")

  def publishedReport(cat: TableCatalog): org.apache.spark.sql.DataFrame =
    publishedRead(cat, "rep_fraud", "report_dt")
}
