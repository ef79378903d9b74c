package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIngest
import java.sql.Timestamp

/** Structured Streaming extension: watermarked window counts via
  * MemoryStream, and the stateful velocity detector (mapGroupsWithState
  * runs in batch mode too — same code path, single batch). */
class StreamingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cardWindowCounts: sliding windows aggregate counts + result flags") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val txns = mem.toDF().toDF("card_num", "trans_date", "oper_result")
    val q = StreamingIngest.cardWindowCounts(txns)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("update").start()
    try {
      mem.addData(
        ("K1", ts("2021-01-01 12:00:00"), "REJECT"),
        ("K1", ts("2021-01-01 12:04:00"), "REJECT"),
        ("K1", ts("2021-01-01 12:09:00"), "SUCCESS"),
        ("K2", ts("2021-01-01 12:00:00"), "SUCCESS"))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select("card_num", "txn_cnt", "has_success", "has_reject").collect()
      // K1's [12:00,12:20) window sees all 3 txns with both flags
      assert(rows.exists(r => r.getString(0) == "K1" && r.getLong(1) == 3 &&
        r.getInt(2) == 1 && r.getInt(3) == 1))
      assert(rows.filter(_.getString(0) == "K2").forall(_.getInt(3) == 0))
    } finally q.stop()
  }

  test("file-source stream: decimal-comma CSV drops flow through readTransactionStream") {
    val dir = java.nio.file.Files.createTempDirectory("stream-in")
    val q = StreamingIngest.readTransactionStream(spark, dir.toString)
      .writeStream.format("memory").queryName("txstream")
      .outputMode("append").start()
    try {
      java.nio.file.Files.write(dir.resolve("transactions_01012021.txt"),
        ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n" +
         "TX1;2021-01-01 09:00:00;K1;PAYMENT;1234,56;SUCCESS;T1\n" +
         "TX2;2021-01-01 09:05:00;K2;PAYMENT;7,00;REJECT;T2").getBytes)
      q.processAllAvailable()
      val rows = spark.table("txstream").orderBy("trans_id").collect()
      assert(rows.length === 2)
      assert(rows.head.getDecimal(4).toPlainString === "1234.56")
      assert(rows.head.getString(0) === "TX1")
      // a second drop arrives: only new rows appended
      java.nio.file.Files.write(dir.resolve("transactions_02012021.txt"),
        ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n" +
         "TX3;2021-01-02 09:00:00;K1;PAYMENT;5,00;SUCCESS;T1").getBytes)
      q.processAllAvailable()
      assert(spark.table("txstream").count() === 3)
    } finally q.stop()
  }

  test("velocityAlerts as a STREAM: state carries the last city across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp, String)]
    val txns = mem.toDF().toDF("card_num", "city", "trans_date", "trans_id")
    val q = StreamingIngest.velocityAlerts(spark, txns)
      .writeStream.format("memory").queryName("velalerts")
      .outputMode("append").start()
    try {
      // batch 1: first sighting — no alert possible yet
      mem.addData(("K1", "Moscow", ts("2021-01-01 10:00:00"), "A"))
      q.processAllAvailable()
      assert(spark.table("velalerts").count() === 0)
      // batch 2: new city 30 min later — the alert needs batch 1's STATE
      mem.addData(("K1", "Kazan", ts("2021-01-01 10:30:00"), "B"))
      q.processAllAvailable()
      val rows = spark.table("velalerts").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(rows.toSet === Set(("K1", "B", "Moscow", "Kazan", 1800L)))
      // batch 3: a LATE event (before batch 1's, within the watermark)
      // must not alert with a negative delta nor regress the state
      mem.addData(("K1", "Omsk", ts("2021-01-01 09:45:00"), "L"))
      q.processAllAvailable()
      assert(spark.table("velalerts").count() === 1)
      // batch 4: an on-time event compares against KAZAN@10:30 (same
      // city → no alert). Had the state regressed to the late Omsk row,
      // this would be a different-city pair within the hour and a false
      // second alert would fire.
      mem.addData(("K1", "Kazan", ts("2021-01-01 10:40:00"), "C"))
      q.processAllAvailable()
      assert(spark.table("velalerts").count() === 1)
    } finally q.stop()
  }

  test("velocityAlerts: same card in a new city within an hour fires; beyond an hour doesn't") {
    val txns = Seq(
      ("K1", "Moscow", ts("2021-01-01 10:00:00"), "A"),
      ("K1", "Kazan", ts("2021-01-01 10:30:00"), "B"),   // 30 min, new city → alert
      ("K1", "Moscow", ts("2021-01-01 13:00:00"), "C"),  // 2.5 h later → no alert
      ("K2", "Moscow", ts("2021-01-01 10:00:00"), "D"),
      ("K2", "Moscow", ts("2021-01-01 10:10:00"), "E"))  // same city → no alert
      .toDF("card_num", "city", "trans_date", "trans_id")
    val alerts = StreamingIngest.velocityAlerts(spark, txns).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(alerts.toSet === Set(("K1", "B", "Moscow", "Kazan")))
  }
}
