package graft

import org.apache.spark.sql.{Row, SaveMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.TableCatalog
import graft.io.Sources
import graft.report.FraudReport
import java.nio.file.{Files, Paths}
import java.sql.Date

/** End-to-end golden test (SURVEY §5.2): a two-date mini-world per
  * FIXTURES.md A5 — every rule has a positive and a near-miss — run
  * through the full Runner (staging → archive → SCD2 → facts → report),
  * then the report is compared row-for-row against hand-computed
  * expectations, event_type strings byte-exact.
  *
  * Date-2 expectations encode a preserved reference behavior: the report
  * query scans the ENTIRE transactions fact each run (main.py:544 has no
  * date filter), so date-1 frauds are re-reported on date 2 with
  * report_dt = date2 — and with the client's NEW phone, because the
  * report joins current dim versions (main.py:547).
  */
class GoldenEndToEndSpec extends AnyFunSuite with SparkTestSession {

  private def write(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes("UTF-8"))

  private def setupWorld(root: String): Unit = {
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))

    // ---- source DB snapshots (parquet, info.* shapes) per date dir
    import spark.implicits._
    def writeClients(dir: String, c1Phone: String): Unit =
      Seq(
        ("C1", "Ivanov", "Ivan", "Ivanovich", "1980-01-01", "P1", "2030-01-01", c1Phone),
        ("C2", "Petrov", "Petr", "Petrovich", "1981-01-01", "P2", "2020-06-30", "+7002"),
        ("C3", "Sidorov", "Sidr", "Sidorovich", "1982-01-01", "P3", "2030-01-01", "+7003"),
        ("C4", "Smirnov", "Semen", "Semenovich", "1983-01-01", "P4", "2030-01-01", "+7004"),
        ("C5", "Kuznetsov", "Kuzma", "Kuzmich", "1984-01-01", "P5", "2030-01-01", "+7005"),
        ("C6", "Popov", "Pavel", "Pavlovich", "1985-01-01", "P6", "2030-01-01", "+7006"),
        ("C7", "Volkov", "Viktor", "Viktorovich", "1986-01-01", "P7", "2030-01-01", "+7007"),
        ("C8", "Zaytsev", "Zakhar", "Zakharovich", "1987-01-01", "P8", "2030-01-01", "+7008"))
        .toDF("client_id", "last_name", "first_name", "patronymic",
          "date_of_birth_s", "passport_num", "passport_valid_to_s", "phone")
        .selectExpr("client_id", "last_name", "first_name", "patronymic",
          "cast(date_of_birth_s as date) as date_of_birth", "passport_num",
          "cast(passport_valid_to_s as date) as passport_valid_to", "phone")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/clients.parquet")

    def writeAccounts(dir: String): Unit =
      (1 to 8).map(i => (s"A$i", if (i == 4) "2020-12-31" else "2030-01-01", s"C$i"))
        .toDF("account", "valid_to_s", "client")
        .selectExpr("account", "cast(valid_to_s as date) as valid_to", "client")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/accounts.parquet")

    def writeCards(dir: String): Unit =
      (1 to 8).map(i => (s"K$i", s"A$i")).toDF("card_num", "account")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/cards.parquet")

    Files.createDirectories(Paths.get(s"$root/src1"))
    writeClients(s"$root/src1", "+7001")
    writeAccounts(s"$root/src1"); writeCards(s"$root/src1")
    Files.createDirectories(Paths.get(s"$root/src2"))
    writeClients(s"$root/src2", "+7999")   // date2: C1's phone changes
    writeAccounts(s"$root/src2"); writeCards(s"$root/src2")

    // ---- date-1 file drops (DDMMYYYY = 01012021)
    write(s"$in/terminals_01012021.csv",
      Seq("terminal_id,terminal_type,terminal_city,terminal_address",
        "T1,ATM,Moscow,Addr1", "T2,POS,Kazan,Addr2", "T3,ATM,Moscow,Addr3"))
    write(s"$in/passport_blacklist_01012021.csv",
      Seq("passport,date", "P1,2020-12-30"))
    write(s"$in/transactions_01012021.txt",
      Seq("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
        // C3 blocked passport (C1/P1 blacklisted)
        "TX1;2021-01-01 09:00:00;K1;PAYMENT;10,50;SUCCESS;T1",
        // C4 expired passport (C2 valid_to 2020-06-30)
        "TX2;2021-01-01 09:10:00;K2;PAYMENT;20,00;SUCCESS;T1",
        // clean txn (C3)
        "TX3;2021-01-01 09:20:00;K3;PAYMENT;30,00;SUCCESS;T1",
        // C5 expired contract (A4 valid_to 2020-12-31)
        "TX4;2021-01-01 09:30:00;K4;PAYMENT;40,00;SUCCESS;T1",
        // C6 cross-city pair on K5: Moscow 10:00 / Kazan 10:30 → both
        "TX5A;2021-01-01 10:00:00;K5;PAYMENT;50,00;SUCCESS;T1",
        "TX5B;2021-01-01 10:30:00;K5;PAYMENT;55,00;SUCCESS;T2",
        // near-miss: K6 Moscow 10:00 / Kazan 11:01 (61 min)
        "TX6A;2021-01-01 10:00:00;K6;PAYMENT;60,00;SUCCESS;T1",
        "TX6B;2021-01-01 11:01:00;K6;PAYMENT;65,00;SUCCESS;T2",
        // C7 brute force on K7: 100>75>50>25, R,R,R,S within 15 min
        "TX7A;2021-01-01 12:00:00;K7;PAYMENT;100,00;REJECT;T3",
        "TX7B;2021-01-01 12:05:00;K7;PAYMENT;75,00;REJECT;T3",
        "TX7C;2021-01-01 12:10:00;K7;PAYMENT;50,00;REJECT;T3",
        "TX7D;2021-01-01 12:15:00;K7;PAYMENT;25,00;SUCCESS;T3",
        // near-miss on K8: amounts not decreasing (3rd is 80)
        "TX8A;2021-01-01 13:00:00;K8;PAYMENT;100,00;REJECT;T3",
        "TX8B;2021-01-01 13:05:00;K8;PAYMENT;75,00;REJECT;T3",
        "TX8C;2021-01-01 13:10:00;K8;PAYMENT;80,00;REJECT;T3",
        "TX8D;2021-01-01 13:15:00;K8;PAYMENT;25,00;SUCCESS;T3"))

    // ---- date-2 drops (02012021): one clean txn; blacklist re-lists P1.
    // Date 2 arrives as NATIVE xlsx (the reference's actual format,
    // main.py:98/111) — exercises the XlsxAdapter through the full Runner;
    // P9's entry_dt is an Excel date serial (44198 = 2021-01-02).
    XlsxTestWriter.writeXlsx(s"$in/terminals_02012021.xlsx", "terminals", Seq(
      Seq("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
      Seq("T1", "ATM", "Moscow", "Addr1"),
      Seq("T2", "POS", "Kazan", "Addr2"),
      Seq("T3", "ATM", "Moscow", "Addr3")))
    XlsxTestWriter.writeXlsx(s"$in/passport_blacklist_02012021.xlsx", "blacklist", Seq(
      Seq("passport", "date"),
      Seq("P1", "2021-01-02"),
      Seq("P9", "#44198")))
    write(s"$in/transactions_02012021.txt",
      Seq("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
        "TX9;2021-01-02 09:00:00;K6;PAYMENT;70,00;SUCCESS;T1"))
  }

  test("two-date golden run: report rows, SCD2 history, blacklist dedup") {
    val root = Files.createTempDirectory("graft-golden").toString
    setupWorld(root)
    val cat = new TableCatalog(spark, s"$root/warehouse")

    // date-specific source snapshots: swap the SourceDb between dates
    val runner1 = new Runner(spark, cat, new Sources.SnapshotSourceDb(s"$root/src1"))
    runner1.runDate(s"$root/in", "01012021")

    // ---- date-1 report
    val rep1 = cat.read("rep_fraud").collect().toSet
    def row(eventDt: String, passport: String, fio: String, phone: String,
            eventType: String, repDt: String) =
      Row(java.sql.Timestamp.valueOf(eventDt), passport, fio, phone, eventType,
        Date.valueOf(repDt))
    val expectedD1 = Set(
      row("2021-01-01 09:00:00", "P1", "Ivan Ivanovich Ivanov", "+7001",
        FraudReport.BlockedPassport, "2021-01-01"),
      row("2021-01-01 09:10:00", "P2", "Petr Petrovich Petrov", "+7002",
        FraudReport.ExpiredPassport, "2021-01-01"),
      row("2021-01-01 09:30:00", "P4", "Semen Semenovich Smirnov", "+7004",
        FraudReport.InvalidContract, "2021-01-01"),
      row("2021-01-01 10:00:00", "P5", "Kuzma Kuzmich Kuznetsov", "+7005",
        FraudReport.CrossCity, "2021-01-01"),
      row("2021-01-01 10:30:00", "P5", "Kuzma Kuzmich Kuznetsov", "+7005",
        FraudReport.CrossCity, "2021-01-01"),
      row("2021-01-01 12:00:00", "P7", "Viktor Viktorovich Volkov", "+7007",
        FraudReport.BruteForce, "2021-01-01"))
    assert(rep1 === expectedD1)

    // ---- files archived
    assert(Files.exists(Paths.get(s"$root/in/archive/transactions_01012021.txt.backup")))
    assert(!Files.exists(Paths.get(s"$root/in/transactions_01012021.txt")))

    // ---- date 2
    val runner2 = new Runner(spark, cat, new Sources.SnapshotSourceDb(s"$root/src2"))
    runner2.runDate(s"$root/in", "02012021")

    // SCD2: C1 has a closed old-phone row and an open new-phone row
    def clientsHist = cat.readScd2("dim_clients_hist", graft.schemas.Schemas.dimClientsHist)
    val c1 = clientsHist.filter("client_id = 'C1'")
      .select("phone", "effective_from", "effective_to", "deleted_flg")
      .collect().toSet
    assert(c1 === Set(
      Row("+7001", Date.valueOf("2021-01-01"), Date.valueOf("2021-01-02"), true),
      Row("+7999", Date.valueOf("2021-01-02"), Date.valueOf("3000-01-01"), false)))
    // unchanged client: still exactly one open row
    assert(clientsHist.filter("client_id = 'C2'").count() === 1)

    // blacklist dedup: P1 kept once with its FIRST entry_dt (quirk §2.9.4)
    val bl = cat.read("fact_passport_blacklist").collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(bl === Set(("P1", "2020-12-30"), ("P9", "2021-01-02")))

    // date-2 report: date-1 frauds re-reported with report_dt=date2 and
    // C1's NEW phone; TX9 stays clean
    val rep2 = cat.read("rep_fraud")
      .filter("report_dt = date '2021-01-02'")
      .select("event_dt", "passport", "fio", "phone", "event_type", "report_dt")
      .collect().toSet
    val expectedD2 = Set(
      row("2021-01-01 09:00:00", "P1", "Ivan Ivanovich Ivanov", "+7999",
        FraudReport.BlockedPassport, "2021-01-02"),
      row("2021-01-01 09:10:00", "P2", "Petr Petrovich Petrov", "+7002",
        FraudReport.ExpiredPassport, "2021-01-02"),
      row("2021-01-01 09:30:00", "P4", "Semen Semenovich Smirnov", "+7004",
        FraudReport.InvalidContract, "2021-01-02"),
      row("2021-01-01 10:00:00", "P5", "Kuzma Kuzmich Kuznetsov", "+7005",
        FraudReport.CrossCity, "2021-01-02"),
      row("2021-01-01 10:30:00", "P5", "Kuzma Kuzmich Kuznetsov", "+7005",
        FraudReport.CrossCity, "2021-01-02"),
      row("2021-01-01 12:00:00", "P7", "Viktor Viktorovich Volkov", "+7007",
        FraudReport.BruteForce, "2021-01-02"))
    assert(rep2 === expectedD2)

    // ---- reprocessing idempotency (SURVEY §7.4): restore date-2 inputs
    // from the archive and rerun the date; partition overwrites and the
    // SCD2 no-op must leave every table unchanged.
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(s"$root/in/archive")).iterator().asScala
      .filter(_.getFileName.toString.contains("02012021"))
      .foreach { p =>
        Files.copy(p, Paths.get(s"$root/in",
          p.getFileName.toString.stripSuffix(".backup")))
      }
    runner2.runDate(s"$root/in", "02012021")
    assert(cat.read("rep_fraud").filter("report_dt = date '2021-01-02'")
      .select("event_dt", "passport", "fio", "phone", "event_type", "report_dt")
      .collect().toSet === expectedD2)
    assert(cat.read("fact_transactions").count() === 17)   // 16 + TX9, no dups
    assert(clientsHist.filter("client_id = 'C1'").count() === 2)
    assert(cat.read("fact_passport_blacklist").count() === 2)
  }
}
