package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, date_sub, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.TableCatalog
import graft.io.Sources
import graft.report.FraudReport
import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

/** Runner's incremental report mode (VERDICT r2 #1): rule inputs scan
  * only the {date-1, date} load_dt partitions; the report covers the
  * date's partition plus yesterday's LATE EDGE (final hour), anti-joined
  * against yesterday's report — instead of the reference's full-history
  * scan every date.
  *
  * The fixture world crosses midnight three ways on purpose:
  *   - a cross-city pair with one leg per date (both legs must be
  *     reported at date 2 — the D-1 leg via the edge);
  *   - a brute-force R,R,R sequence late on date 1 completed by a
  *     SUCCESS early on date 2 — rule 5 flags the DATE-1 start txn, so
  *     without the edge this fraud would never be reported at all;
  *   - a per-txn fraud (expired passport) in the edge window already
  *     reported at date 1 — the anti-join must keep it from repeating.
  * The pinned divergence from full mode: each fraud is reported ONCE, at
  * the date it becomes detectable, instead of re-reported every date.
  */
class IncrementalReportSpec extends AnyFunSuite with SparkTestSession {

  private def write(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes("UTF-8"))

  /** C1 clean, C2 expired passport, C3 clean (brute-force card). */
  private def setupWorld(root: String): Unit = {
    import spark.implicits._
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    Files.createDirectories(Paths.get(s"$root/src"))

    Seq(
      ("C1", "Ivanov", "Ivan", "Ivanovich", "1980-01-01", "P1", "2030-01-01", "+7001"),
      ("C2", "Petrov", "Petr", "Petrovich", "1981-01-01", "P2", "2020-06-30", "+7002"),
      ("C3", "Sidorov", "Sidr", "Sidorovich", "1982-01-01", "P3", "2030-01-01", "+7003"))
      .toDF("client_id", "last_name", "first_name", "patronymic",
        "date_of_birth_s", "passport_num", "passport_valid_to_s", "phone")
      .selectExpr("client_id", "last_name", "first_name", "patronymic",
        "cast(date_of_birth_s as date) as date_of_birth", "passport_num",
        "cast(passport_valid_to_s as date) as passport_valid_to", "phone")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/clients.parquet")
    Seq(("A1", "2030-01-01", "C1"), ("A2", "2030-01-01", "C2"),
      ("A3", "2030-01-01", "C3"))
      .toDF("account", "valid_to_s", "client")
      .selectExpr("account", "cast(valid_to_s as date) as valid_to", "client")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/accounts.parquet")
    Seq(("K1", "A1"), ("K2", "A2"), ("K3", "A3")).toDF("card_num", "account")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/src/cards.parquet")

    for (d <- Seq("01012021", "02012021")) {
      write(s"$in/terminals_$d.csv",
        Seq("terminal_id,terminal_type,terminal_city,terminal_address",
          "T1,ATM,Moscow,Addr1", "T2,POS,Kazan,Addr2"))
      write(s"$in/passport_blacklist_$d.csv",
        Seq("passport,date", s"P99,2020-12-30"))   // matches no client
    }
    write(s"$in/transactions_01012021.txt",
      Seq("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
        // edge-window per-txn fraud: reported at date 1, must NOT repeat
        "TX0;2021-01-01 23:30:00;K2;PAYMENT;5,00;SUCCESS;T1",
        // date-1 leg of the cross-midnight city pair — clean at date 1
        "TX1;2021-01-01 23:50:00;K1;PAYMENT;10,00;SUCCESS;T1",
        // brute-force prefix: window still open at date-1's run
        "B1;2021-01-01 23:45:00;K3;PAYMENT;100,00;REJECT;T1",
        "B2;2021-01-01 23:50:00;K3;PAYMENT;75,00;REJECT;T1",
        "B3;2021-01-01 23:55:00;K3;PAYMENT;50,00;REJECT;T1"))
    write(s"$in/transactions_02012021.txt",
      Seq("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
        // completes the brute-force window → flags the DATE-1 start B1
        "B4;2021-01-02 00:03:00;K3;PAYMENT;25,00;SUCCESS;T1",
        // date-2 leg: other city, 30 min later → pair with TX1
        "TX2;2021-01-02 00:20:00;K1;PAYMENT;20,00;SUCCESS;T2",
        // per-txn rule on date 2 itself
        "TX3;2021-01-02 09:00:00;K2;PAYMENT;30,00;SUCCESS;T1"))
  }

  private def runBoth(root: String, incremental: Boolean): TableCatalog = {
    val cat = new TableCatalog(spark,
      s"$root/warehouse_${if (incremental) "inc" else "full"}")
    val runner = new Runner(spark, cat, new Sources.SnapshotSourceDb(s"$root/src"),
      incrementalReport = incremental)
    runner.runDate(s"$root/in", "01012021")
    runner.runDate(s"$root/in", "02012021")
    cat
  }

  private def rep(cat: TableCatalog, repDt: String) =
    cat.read("rep_fraud").filter(s"report_dt = date '$repDt'")
      .select("event_dt", "passport", "fio", "phone", "event_type", "report_dt")
      .collect().toSet

  test("each fraud reported once at its detection date; cross-midnight brute force and city pair included") {
    val rootA = Files.createTempDirectory("graft-inc-full").toString
    setupWorld(rootA)
    val full = runBoth(rootA, incremental = false)
    // Runner archives the inputs, so the second mode gets its own copy.
    val rootB = Files.createTempDirectory("graft-inc-inc").toString
    setupWorld(rootB)
    val inc = runBoth(rootB, incremental = true)

    def row(eventDt: String, passport: String, fio: String, phone: String,
            eventType: String, repDt: String) =
      org.apache.spark.sql.Row(Timestamp.valueOf(eventDt), passport, fio,
        phone, eventType, Date.valueOf(repDt))
    def tx0(repDt: String) = row("2021-01-01 23:30:00", "P2",
      "Petr Petrovich Petrov", "+7002", FraudReport.ExpiredPassport, repDt)
    val tx1Retro = row("2021-01-01 23:50:00", "P1", "Ivan Ivanovich Ivanov",
      "+7001", FraudReport.CrossCity, "2021-01-02")
    val b1Start = row("2021-01-01 23:45:00", "P3", "Sidr Sidorovich Sidorov",
      "+7003", FraudReport.BruteForce, "2021-01-02")
    val tx2 = row("2021-01-02 00:20:00", "P1", "Ivan Ivanovich Ivanov",
      "+7001", FraudReport.CrossCity, "2021-01-02")
    val tx3 = row("2021-01-02 09:00:00", "P2", "Petr Petrovich Petrov",
      "+7002", FraudReport.ExpiredPassport, "2021-01-02")

    // Date 1: only the per-txn fraud fires — identically in both modes.
    assert(rep(full, "2021-01-01") === Set(tx0("2021-01-01")))
    assert(rep(inc, "2021-01-01") === Set(tx0("2021-01-01")))

    // Date 2, incremental: both legs of the city pair (the D-1 leg via
    // the edge), the D-1 brute-force START (rule 5 flags the start txn —
    // lost entirely without the edge), the date-2 expired passport; TX0
    // does NOT repeat (anti-join against yesterday's report).
    assert(rep(inc, "2021-01-02") === Set(tx1Retro, b1Start, tx2, tx3))

    // Full scan re-reports yesterday's TX0 too — restricted to rows not
    // already reported, the two modes agree exactly.
    val fullD2 = rep(full, "2021-01-02")
    assert(fullD2 === Set(tx0("2021-01-02"), tx1Retro, b1Start, tx2, tx3))
    assert(fullD2 -- Set(tx0("2021-01-02")) === rep(inc, "2021-01-02"))
  }

  test("the incremental rule scan prunes load_dt partitions") {
    val root = Files.createTempDirectory("graft-inc-prune").toString
    setupWorld(root)
    val cat = runBoth(root, incremental = true)
    val d = Date.valueOf("2021-01-02")
    val plan = cat.read("fact_transactions")
      .filter(col("load_dt").between(date_sub(lit(d), 1), lit(d)))
      .queryExecution.executedPlan.toString
    // "PartitionFilters: []" prints even when empty — require content.
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]+\\].*"),
      s"expected non-empty PartitionFilters in:\n$plan")
  }
}
