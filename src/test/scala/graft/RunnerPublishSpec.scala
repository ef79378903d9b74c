package graft

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.TableCatalog
import graft.io.Sources
import java.nio.file.{Files, Paths}
import java.sql.Date

/** Per-date publish protocol (VERDICT r6 #5): `runDate` writes a
  * `_commits/<date>` marker only AFTER the report partition — the last
  * write of the batch — has landed. A crash mid-date leaves partial
  * partitions on disk but invisible to the marker-aware read path
  * ([[Runner.publishedRead]]); replaying the date rewrites exactly those
  * partitions (dynamic per-partition overwrite) and then commits.
  *
  * The crash is injected between the fact append and the report write via
  * the `onBeforeReport` hook — the widest partial-state window: facts for
  * the date are on disk, the report is not.
  */
class RunnerPublishSpec extends AnyFunSuite with SparkTestSession {

  private def write(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes("UTF-8"))

  /** One client C1 whose passport P1 is blacklisted on date 1 — every
    * transaction on K1 reports as blocked-passport, so both dates have
    * report rows to (not) see through the published read. */
  private def setupWorld(root: String): Unit = {
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    Files.createDirectories(Paths.get(s"$root/src"))
    import spark.implicits._
    Seq(("C1", "Ivanov", "Ivan", "Ivanovich", "1980-01-01", "P1", "2030-01-01", "+7001"))
      .toDF("client_id", "last_name", "first_name", "patronymic",
        "dob_s", "passport_num", "pvt_s", "phone")
      .selectExpr("client_id", "last_name", "first_name", "patronymic",
        "cast(dob_s as date) as date_of_birth", "passport_num",
        "cast(pvt_s as date) as passport_valid_to", "phone")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/clients.parquet")
    Seq(("A1", "2030-01-01", "C1")).toDF("account", "vt_s", "client")
      .selectExpr("account", "cast(vt_s as date) as valid_to", "client")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/accounts.parquet")
    Seq(("K1", "A1")).toDF("card_num", "account")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/cards.parquet")

    for ((d, tx, ts) <- Seq(("01012021", "TX1", "2021-01-01 09:00:00"),
                            ("02012021", "TX2", "2021-01-02 09:00:00"))) {
      write(s"$in/terminals_$d.csv",
        Seq("terminal_id,terminal_type,terminal_city,terminal_address",
          "T1,ATM,Moscow,Addr1"))
      write(s"$in/passport_blacklist_$d.csv",
        Seq("passport,date", "P1,2020-12-30"))
      write(s"$in/transactions_$d.txt",
        Seq("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
          s"$tx;$ts;K1;PAYMENT;10,50;SUCCESS;T1"))
    }
  }

  // the crash-replay suite runs against BOTH committers — the marker
  // protocol must converge identically over POSIX renames and the
  // append-only commit log (VERDICT r7 next #8)
  Seq("posix" -> graft.catalog.PosixCommitter,
      "log" -> graft.catalog.LogCommitter).foreach { case (cname, cmtr) =>
  test(s"crash between fact and report [$cname]: date invisible until rerun commits") {
    val root = Files.createTempDirectory("graft-publish").toString
    setupWorld(root)
    val cat = new TableCatalog(spark, s"$root/warehouse", committer = cmtr)
    val db = new Sources.SnapshotSourceDb(s"$root/src")
    val d1 = Date.valueOf("2021-01-01")
    val d2 = Date.valueOf("2021-01-02")

    // ---- date 1 completes normally → committed and published
    new Runner(spark, cat, db).runDate(s"$root/in", "01012021")
    assert(Runner.isDateCommitted(cat, d1))
    assert(Runner.committedDates(cat) === Seq(d1))
    assert(Runner.publishedTransactions(cat).count() === 1)
    val rep1 = Runner.publishedReport(cat).collect()
    assert(rep1.length === 1 && rep1.head.getAs[Date]("report_dt") === d1)

    // ---- date 2 crashes between the fact append and the report write
    val crashing = new Runner(spark, cat, db,
      onBeforeReport = () => throw new RuntimeException("kill -9"))
    intercept[RuntimeException] {
      crashing.runDate(s"$root/in", "02012021")
    }

    // partial state IS on disk (the fact partition landed)...
    assert(cat.read("fact_transactions").count() === 2)
    // ...but the date never committed, so the marker-aware reads hide it
    assert(!Runner.isDateCommitted(cat, d2))
    assert(Runner.committedDates(cat) === Seq(d1))
    assert(Runner.publishedTransactions(cat).count() === 1)
    assert(Runner.publishedReport(cat)
      .filter(s"report_dt = date '2021-01-02'").count() === 0)

    // ---- rerun the date (inputs were archived before the crash point —
    // restore them, as the documented reprocessing contract does)
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(s"$root/in/archive")).iterator().asScala
      .filter(_.getFileName.toString.contains("02012021"))
      .foreach { p =>
        Files.copy(p, Paths.get(s"$root/in",
          p.getFileName.toString.stripSuffix(".backup")))
      }
    new Runner(spark, cat, db).runDate(s"$root/in", "02012021")

    // converged: committed, published, and the partial partitions were
    // REWRITTEN (dynamic overwrite), not duplicated
    assert(Runner.isDateCommitted(cat, d2))
    assert(Runner.committedDates(cat) === Seq(d1, d2))
    assert(Runner.publishedTransactions(cat).count() === 2)
    assert(cat.read("fact_transactions").count() === 2)
    // full-mode report re-reports date-1's fraud on date 2 (reference
    // behavior) plus date-2's own: two rows under report_dt = date2
    assert(Runner.publishedReport(cat)
      .filter(s"report_dt = date '2021-01-02'").count() === 2)
    assert(cat.read("fact_passport_blacklist").count() === 1)
  }
  }

  test("publishedRead prunes partitions at the scan") {
    val root = Files.createTempDirectory("graft-publish-prune").toString
    setupWorld(root)
    val cat = new TableCatalog(spark, s"$root/warehouse")
    new Runner(spark, cat, new Sources.SnapshotSourceDb(s"$root/src"))
      .runDate(s"$root/in", "01012021")
    val plan = Runner.publishedTransactions(cat)
      .queryExecution.executedPlan.toString
    // the IN-literal filter on the partition column must reach the scan
    // as a partition filter, not a post-scan row filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("load_dt"))
  }
}
