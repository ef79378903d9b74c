package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Archiver, Sources}
import java.nio.file.{Files, Paths}

/** S1/S2/S9 — date discovery (chronological-order fix), decimal-comma CSV
  * parse, archiver. */
class SourcesSpec extends AnyFunSuite with SparkTestSession {

  test("S1: dates discovered uniquely and sorted CHRONOLOGICALLY, not lexicographically") {
    val dir = Files.createTempDirectory("graft-dates")
    Seq("transactions_02012021.txt", "terminals_02012021.csv",
      "transactions_01022021.txt", "notes.md").foreach(f =>
      Files.createFile(dir.resolve(f)))
    // lexicographic would put 01022021 (Feb 1) before 02012021 (Jan 2) —
    // the reference bug (main.py:33, SURVEY §2.9.2); chronological fixes it
    assert(Sources.listUniqueDates(dir.toString) === Seq("02012021", "01022021"))
  }

  test("S2: ';'-separated CSV with decimal comma parses to DecimalType(18,2)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("transactions_01012021.txt"),
      ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n" +
       "TX1;2021-01-01 09:00:00;K1;PAYMENT;1234,56;SUCCESS;T1\n" +
       "TX2;2021-01-01 09:05:00;K1;PAYMENT;7,00;REJECT;T1").getBytes)
    val df = Sources.readTransactionsCsv(spark, dir.resolve("transactions_01012021.txt").toString)
    assert(df.schema.fieldNames.toSeq ===
      Seq("trans_id", "trans_date", "card_num", "oper_type", "amt", "oper_result", "terminal"))
    val amts = df.orderBy("trans_id").collect().map(_.getDecimal(4).toPlainString)
    assert(amts.toSeq === Seq("1234.56", "7.00"))
    assert(df.filter("trans_date = timestamp '2021-01-01 09:00:00'").count() === 1)
  }

  test("quarantine reader: corrupt rows carry raw text, good rows parse; edge inputs") {
    val dir = Files.createTempDirectory("graft-quar")
    val f = dir.resolve("transactions_01012021.txt")
    Files.write(f, java.util.Arrays.asList(
      "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
      "T1;2021-01-01 09:00:00;C1;PAY;12,50;OK;TERM1",
      "T2;NOT-A-TIMESTAMP;C2;PAY;1,00;OK;TERM1",   // bad timestamp → quarantine
      "T3;2021-01-01 10:00:00;C3;PAY;7,00;OK;TERM2"))
    val (good, bad) = Sources.readTransactionsCsvQuarantined(spark, f.toString)
    assert(good.collect().map(_.getString(0)).sorted.toSeq === Seq("T1", "T3"))
    // the quarantined row keeps its ORIGINAL raw text for reprocessing
    val raw = bad.collect().map(_.getString(0))
    assert(raw.length === 1 && raw.head.startsWith("T2;NOT-A-TIMESTAMP"))
    // clean input → empty quarantine; fully-broken input → empty good side
    val clean = dir.resolve("clean.txt")
    Files.write(clean, java.util.Arrays.asList(
      "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
      "T9;2021-01-01 09:00:00;C9;PAY;1,00;OK;TERM1"))
    val (g2, b2) = Sources.readTransactionsCsvQuarantined(spark, clean.toString)
    assert(g2.count() === 1 && b2.count() === 0)
  }

  test("S9: archiver moves only the date's files, creates archive/ defensively") {
    val dir = Files.createTempDirectory("graft-arch")
    Seq("transactions_01012021.txt", "transactions_02012021.txt", "readme.md")
      .foreach(f => Files.createFile(dir.resolve(f)))
    Archiver.filesToArchive(dir.toString, "01012021")
    assert(Files.exists(dir.resolve("archive/transactions_01012021.txt.backup")))
    assert(!Files.exists(dir.resolve("transactions_01012021.txt")))
    assert(Files.exists(dir.resolve("transactions_02012021.txt")))
    assert(Files.exists(dir.resolve("readme.md")))
  }
}
