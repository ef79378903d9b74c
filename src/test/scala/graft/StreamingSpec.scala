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

  test("zscoreAlerts: streaming state across micro-batches equals the batch window path") {
    implicit val sc = spark.sqlContext
    // card K1: five flat amounts (10.00), then a spike and a normal row
    // arriving in a SECOND micro-batch — the spike must score against
    // batch 1's accumulated moments. K2 never reaches minN.
    val batch1 = Seq(
      ("K1", ts("2021-01-01 10:00:00"), "A1", 1000L),
      ("K1", ts("2021-01-01 10:05:00"), "A2", 1000L),
      ("K1", ts("2021-01-01 10:10:00"), "A3", 1010L),
      ("K1", ts("2021-01-01 10:15:00"), "A4", 990L),
      ("K1", ts("2021-01-01 10:20:00"), "A5", 1000L),
      ("K2", ts("2021-01-01 10:00:00"), "B1", 5000L))
    val batch2 = Seq(
      ("K1", ts("2021-01-01 10:25:00"), "A6", 9900L), // spike -> alert
      ("K1", ts("2021-01-01 10:30:00"), "A7", 1000L), // pulled mean: still far? scored vs history incl. spike
      ("K2", ts("2021-01-01 10:05:00"), "B2", 5100L))
    val cols = Seq("card_num", "trans_date", "trans_id", "cents")

    val mem = MemoryStream[(String, Timestamp, String, Long)]
    val q = StreamingIngest.zscoreAlerts(spark, mem.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("zalerts")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("zalerts")
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      val batchOut = StreamingIngest.zscoreAlerts(spark,
          (batch1 ++ batch2).toDF(cols: _*))
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batchOut)
      // the spike itself alerts with exact integer scores
      val spike = streamed.find(_._2 == "A6").get
      assert(spike === (("K1", "A6", 9900L, 5L, 44500L, 1000L)))
    } finally q.stop()
  }

  test("streaming SCD2 maintenance: micro-batches converge to the batch merge") {
    import org.apache.spark.sql.types._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-scd2")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val dimSpec = graft.etl.Scd2.DimSpec("id", Seq("attr"))
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("attr", StringType),
      StructField("effective_from", DateType), StructField("effective_to", DateType),
      StructField("deleted_flg", BooleanType)))
    val d1 = java.sql.Date.valueOf("2021-01-01")
    val d2 = java.sql.Date.valueOf("2021-01-02")
    val open = java.sql.Date.valueOf("3000-01-01")

    val mem = MemoryStream[(String, String, java.sql.Date)]
    val q = StreamingIngest.startScd2Maintenance(cat, "dim_x", dimSpec, schema,
      mem.toDF().toDF("id", "attr", "change_date"),
      root.resolve("ckpt").toString)
    try {
      mem.addData(("a", "x", d1), ("b", "p", d1))
      q.processAllAvailable()
      // batch 2: a changes, c is new — the close must see batch 1's STATE
      mem.addData(("a", "x2", d2), ("c", "q", d2))
      q.processAllAvailable()
      // batch 3: ANOTHER change on the SAME date — its closed write
      // lands in the same effective_to=d2 partition and must not wipe
      // batch 2's closure of a
      mem.addData(("b", "p2", d2))
      q.processAllAvailable()
    } finally q.stop()

    val openRows = cat.read("dim_x_open").collect().toSet
    assert(openRows === Set(
      org.apache.spark.sql.Row("a", "x2", d2, open, false),
      org.apache.spark.sql.Row("b", "p2", d2, open, false),
      org.apache.spark.sql.Row("c", "q", d2, open, false)))
    val closedRows = cat.read("dim_x_closed")
      .select("id", "attr", "effective_from", "effective_to", "deleted_flg")
      .collect().toSet
    assert(closedRows === Set(
      org.apache.spark.sql.Row("a", "x", d1, d2, true),
      org.apache.spark.sql.Row("b", "p", d1, d2, true)))

    // a REPLAYED batch (same content, fresh query+checkpoint) is a no-op:
    // change detection finds nothing, closed/open content is unchanged
    val mem2 = MemoryStream[(String, String, java.sql.Date)]
    val q2 = StreamingIngest.startScd2Maintenance(cat, "dim_x", dimSpec, schema,
      mem2.toDF().toDF("id", "attr", "change_date"),
      root.resolve("ckpt2").toString)
    try {
      mem2.addData(("a", "x2", d2), ("c", "q", d2))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(cat.read("dim_x_open").collect().toSet === openRows)
    assert(cat.read("dim_x_closed")
      .select("id", "attr", "effective_from", "effective_to", "deleted_flg")
      .collect().toSet === closedRows)
  }

  test("streaming dedup maintenance: accumulated pairs ≡ one-shot LSH; re-delivery is a no-op") {
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-lsh")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val body = "the quick brown fox jumps over the lazy dog again and again tonight"
    val allDocs = Seq(
      (1L, body + " alpha"), (2L, body + " alpha beta"),      // batch-1 pair
      (3L, body + " gamma"), (4L, "unrelated words entirely different content here"),
      (5L, body + " gamma delta"),                            // pairs with 3 across batches
      (6L, body + " epsilon"), (7L, body + " epsilon zeta")   // batch-3 pair
    )
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startDedupMaintenance(cat, "docs", "lsh_index",
      "pairs", mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      root.resolve("ckpt").toString)
    try {
      Seq(allDocs.slice(0, 4), allDocs.slice(4, 5), allDocs.slice(5, 7))
        .foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      // re-deliver batch 2 (at-least-once source): nothing may change
      val before = cat.read("pairs").collect().toSet
      mem.addData(allDocs.slice(4, 5): _*)
      q.processAllAvailable()
      assert(cat.read("pairs").collect().toSet === before)
    } finally q.stop()

    val streamPairs = cat.read("pairs")
      .select(col("id_a"), col("id_b"), col("est_jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val oneShot = graft.ops.Dedup.minhashLsh(
      allDocs.toDF("doc_id", "text"), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(streamPairs === oneShot)
    // every doc lands in docs/index exactly once, despite the re-delivery
    assert(cat.read("docs").count() === allDocs.length)
    assert(cat.read("lsh_index").select("doc_id").distinct().count() === 7)
    assert(cat.read("lsh_index").groupBy("doc_id", "band", "bucket").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("streaming linkage maintenance: accumulated matches ≡ one-shot linkage; " +
      "a replayed batch id is skipped") {
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-link")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    // master: (id, name, phone, blk); records share blk with 1-2 masters
    val master = Seq(
      (1L, "ann", "111", 10L), (2L, "bob", "222", 10L),
      (3L, "cat", "333", 20L), (4L, "dan", "444", 30L))
      .toDF("mid", "name", "phone", "blk")
    cat.overwrite("link_master", master)
    val recs = Seq(
      (101L, "ann", "111", 10L),            // batch 1: match with 1, differ 2
      (102L, "cat", "999", 20L),            // batch 2: possible with 3
      (103L, "xxx", "000", 30L),            // batch 3: non-match with 4
      (104L, null.asInstanceOf[String], "444", 30L)) // null field -> 0 evidence
    val fields = Seq(("name", 30L, -10L), ("phone", 20L, -10L))
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = StreamingIngest.startLinkageMaintenance(cat, "link_master",
      "link_matches", mem.toDF().toDF("rid", "name", "phone", "blk"),
      "mid", "rid", Seq("blk"), fields, upper = 40L, lower = 0L,
      root.resolve("ckpt").toString)
    try {
      Seq(recs.slice(0, 1), recs.slice(1, 2), recs.slice(2, 4)).foreach { g =>
        mem.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = cat.read("link_matches")
      .select(col("id_a"), col("id_b"), col("score"), col("decision"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    val oneShot = graft.ops.FuzzyJoin.linkage(master, "mid",
        recs.toDF("rid", "name", "phone", "blk"), "rid",
        Seq("blk"), fields, upper = 40L, lower = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got === oneShot)
    // spot-check the decision classes landed as designed
    assert(got((1L, 101L)) === ((50L, "match")))
    assert(got((3L, 102L)) === ((20L, "possible")))
    assert(got((4L, 103L)) === ((-20L, "non_match")))
    assert(got((4L, 104L)) === ((20L, "possible"))) // null name: no evidence
    // marker-level replay guard: a batch id at or below the committed
    // high-water mark must be skipped outright (exactly-once commit)
    val before = cat.read("link_matches").collect().toSet
    val marker = "link_matches__commit"
    val tok = cat.getMarkerWithToken(marker).get._2
    assert(cat.getMarkerFor(marker, tok).get === 2L)
    assert(cat.read("link_matches").collect().toSet === before)
  }

  test("streaming dedup maintenance: a crashed attempt's orphan partitions " +
      "are overwritten on replay, never treated as committed corpus") {
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-lsh-crash")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val body = "the quick brown fox jumps over the lazy dog again and again tonight"
    val allDocs = Seq((1L, body + " alpha"), (2L, body + " alpha beta"))
    // simulate a first attempt of micro-batch 0 that crashed AFTER its
    // partition writes but BEFORE the commit marker: a near-identical
    // ghost doc sits in batch_id=0 of index+docs, and a bogus pair in
    // pairs. If the replay read it as "old corpus", pair (1, 999) or
    // (2, 999) would appear; if partitions appended instead of
    // overwrote, the bogus pair would survive.
    val ghost = graft.ops.Dedup.lshIndex(
        Seq((999L, body + " alpha")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("batch_id", lit(0L))
    cat.appendPartitioned("lsh_index", ghost, "batch_id")
    cat.appendPartitioned("docs",
      Seq((999L, body + " alpha")).toDF("doc_id", "text")
        .withColumn("batch_id", lit(0L)), "batch_id")
    cat.appendPartitioned("pairs",
      Seq((1L, 999L, 1.0, "new_new")).toDF("id_a", "id_b", "est_jaccard",
        "pair_type").withColumn("batch_id", lit(0L)), "batch_id")

    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startDedupMaintenance(cat, "docs", "lsh_index",
      "pairs", mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      root.resolve("ckpt").toString)
    try {
      mem.addData(allDocs: _*); q.processAllAvailable()
    } finally q.stop()

    val streamPairs = cat.read("pairs")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs === Set((1L, 2L)), "orphan rows leaked into results")
    assert(cat.read("docs").select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(cat.read("lsh_index").select(col("doc_id")).distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    // the marker committed the replayed batch
    assert(cat.getMarker("pairs__commit") === Some(0L))
  }

  test("file-source → catalog: kill, resume from checkpoint, rows equal the batch path") {
    val root = java.nio.file.Files.createTempDirectory("stream-cat")
    val in = root.resolve("in"); java.nio.file.Files.createDirectories(in)
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val ckpt = root.resolve("ckpt").toString
    val terminals = Seq(("T1", "Moscow", false), ("T2", "Kazan", false))
      .toDF("terminal_id", "terminal_city", "deleted_flg")
    def startPipeline() = {
      val txns = StreamingIngest.readTransactionStream(spark, in.toString)
      StreamingIngest.startCatalogAppend(cat, "stream_alerts",
        StreamingIngest.velocityAlerts(spark,
          StreamingIngest.withCity(txns, terminals)), ckpt)
    }
    def drop(name: String, rows: String*): Unit =
      java.nio.file.Files.write(in.resolve(name),
        ("transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal"
          +: rows).mkString("\n").getBytes)

    // drop 1: Moscow→Kazan in 30 min → one alert, durably in the catalog
    drop("transactions_01012021.txt",
      "A;2021-01-01 10:00:00;K1;PAYMENT;10,00;SUCCESS;T1",
      "B;2021-01-01 10:30:00;K1;PAYMENT;20,00;SUCCESS;T2")
    val q1 = startPipeline()
    try q1.processAllAvailable() finally q1.stop()
    assert(cat.read("stream_alerts").count() === 1)

    // the query is DOWN; a second drop lands meanwhile. The resumed
    // query must pick it up from the checkpoint — with drop 1's per-card
    // STATE restored (alert C needs Kazan@10:30) and without re-emitting
    // drop 1's alert (no duplicates).
    drop("transactions_02012021.txt",
      "C;2021-01-01 10:50:00;K1;PAYMENT;30,00;SUCCESS;T1")
    val q2 = startPipeline()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = cat.read("stream_alerts")
      .select("card_num", "trans_id", "prevCity", "city", "deltaSeconds")
      .collect().toSet
    assert(streamed === Set(
      org.apache.spark.sql.Row("K1", "B", "Moscow", "Kazan", 1800L),
      org.apache.spark.sql.Row("K1", "C", "Kazan", "Moscow", 1200L)))

    // batch-path equivalence on the same combined input
    val batchTxns = Seq(
      ("A", ts("2021-01-01 10:00:00"), "K1", "T1"),
      ("B", ts("2021-01-01 10:30:00"), "K1", "T2"),
      ("C", ts("2021-01-01 10:50:00"), "K1", "T1"))
      .toDF("trans_id", "trans_date", "card_num", "terminal")
    val batch = StreamingIngest.velocityAlerts(spark,
      StreamingIngest.withCity(batchTxns, terminals))
      .select("card_num", "trans_id", "prevCity", "city", "deltaSeconds")
      .collect().toSet
    assert(streamed === batch)
  }

  test("cardWindowCounts append into the catalog: windows land once the watermark closes them") {
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-wc")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val mem = MemoryStream[(String, Timestamp, String)]
    val txns = mem.toDF().toDF("card_num", "trans_date", "oper_result")
    val q = StreamingIngest.startCatalogAppend(cat, "stream_window_counts",
      StreamingIngest.cardWindowCounts(txns), root.resolve("ckpt").toString)
    try {
      mem.addData(
        ("K1", ts("2021-01-01 12:00:00"), "REJECT"),
        ("K1", ts("2021-01-01 12:04:00"), "REJECT"),
        ("K1", ts("2021-01-01 12:09:00"), "SUCCESS"))
      q.processAllAvailable()
      // append mode: nothing durable until the watermark passes a
      // window's end; two more batches move it to 13:05 - 30 min
      mem.addData(("K2", ts("2021-01-01 13:05:00"), "SUCCESS"))
      q.processAllAvailable()
      mem.addData(("K2", ts("2021-01-01 13:06:00"), "SUCCESS"))
      q.processAllAvailable()
      val done = cat.read("stream_window_counts")
        .selectExpr("card_num", "window.start AS ws", "txn_cnt",
          "has_success", "has_reject")
        .collect().toSet
      // every K1 window is now final (all end ≤ 12:25 ≤ watermark 12:35)
      val k1 = done.filter(_.getString(0) == "K1")
      assert(k1.map(r => (r.getTimestamp(1), r.getLong(2))) === Set(
        (ts("2021-01-01 11:45:00"), 2L), (ts("2021-01-01 11:50:00"), 3L),
        (ts("2021-01-01 11:55:00"), 3L), (ts("2021-01-01 12:00:00"), 3L),
        (ts("2021-01-01 12:05:00"), 1L)))
      // windows holding a 12:00/12:04 REJECT flag it; the 12:05 window
      // holds only the 12:09 SUCCESS
      assert(k1.forall(r => r.getInt(4) ==
        (if (r.getTimestamp(1).before(ts("2021-01-01 12:05:00"))) 1 else 0)))
    } finally q.stop()
  }

  test("stream-stream interval join: cross-batch pairs found, window bounds respected, batch mode identical") {
    implicit val sc = spark.sqlContext
    val txMem = MemoryStream[(String, String, Timestamp)]
    val auMem = MemoryStream[(String, String, Timestamp, String)]
    val q = StreamingIngest.txnWithRecentAuth(
      txMem.toDF().toDF("card_num", "trans_id", "trans_date"),
      auMem.toDF().toDF("card_num", "auth_id", "auth_ts", "auth_result"))
      .writeStream.format("memory").queryName("txauth")
      .outputMode("append").start()
    val txns = Seq(
      ("K1", "T1", ts("2021-01-01 10:00:00")),
      ("K1", "T2", ts("2021-01-01 10:30:00")),
      ("K2", "T3", ts("2021-01-01 10:00:00")))
    val auths = Seq(
      ("K1", "A1", ts("2021-01-01 09:55:00"), "OK"),     // 5 min before T1
      ("K1", "A2", ts("2021-01-01 10:25:00"), "DENY"),   // 5 min before T2
      ("K1", "A3", ts("2021-01-01 09:40:00"), "OK"),     // 20 min before T1 → outside
      ("K2", "A4", ts("2021-01-01 09:59:00"), "OK"))     // other card, T3 only
    try {
      // auth arrives in batch 1, its transaction only in batch 2 — the
      // pair needs buffered join STATE across micro-batches
      auMem.addData(auths.head)
      txMem.addData(txns.drop(1): _*)
      q.processAllAvailable()
      txMem.addData(txns.head)
      auMem.addData(auths.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("txauth").collect()
        .map(r => (r.getString(1), r.getString(3))).toSet
      assert(streamed === Set(("T1", "A1"), ("T2", "A2"), ("T3", "A4")))
      // batch mode over the same rows: identical pairs
      val batch = StreamingIngest.txnWithRecentAuth(
        txns.toDF("card_num", "trans_id", "trans_date"),
        auths.toDF("card_num", "auth_id", "auth_ts", "auth_result"))
        .collect().map(r => (r.getString(1), r.getString(3))).toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("sketch maintenance: merged micro-batch sketches equal the one-shot sketch; batch id rides the state") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val scratch = java.nio.file.Files.createTempDirectory("cmstream")
    val cat = new graft.catalog.TableCatalog(spark, scratch.resolve("wh").toString)
    val mem = MemoryStream[Long]
    val q = StreamingIngest.startSketchMaintenance(cat, "cm",
      mem.toDF().toDF("k"), "k", scratch.resolve("ckpt").toString,
      depth = 2, width = 16)
    val all = (1L to 40L) ++ (1L to 10L) ++ Seq.fill(25)(7L)
    try {
      all.grouped(30).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val state = cat.read("cm")
    // commutative-monoid property: the streamed state IS the one-shot
    // sketch over the concatenation of all batches
    val oneShot = graft.ops.Sketches.countMinBuild(
      all.toDF("k"), org.apache.spark.sql.functions.col("k"),
      depth = 2, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = state.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === oneShot)
    // the replay guard's marker committed with the data, at the last batch id
    assert(state.select("applied_batch").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("dedup maintenance survives a checkpoint RESET: the old marker reads " +
      "as foreign, state wipes, the reprocess equals one-shot (ADVICE r6)") {
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("stream-lsh-reset")
    val cat = new graft.catalog.TableCatalog(spark, root.resolve("wh").toString)
    val body = "the quick brown fox jumps over the lazy dog again and again tonight"
    val allDocs = Seq(
      (1L, body + " alpha"), (2L, body + " alpha beta"),
      (3L, body + " gamma"), (4L, body + " gamma delta"))
    // incarnation 1 sees only the first half of the corpus
    val mem1 = MemoryStream[(Long, String)]
    val q1 = StreamingIngest.startDedupMaintenance(cat, "docs", "lsh_index",
      "pairs", mem1.toDF().toDF("doc_id", "text"), "doc_id", "text",
      root.resolve("ckptA").toString)
    try { mem1.addData(allDocs.take(2): _*); q1.processAllAvailable() }
    finally q1.stop()
    assert(cat.read("pairs").count() === 1L)
    // checkpoint reset: a NEW checkpoint restarts batch ids at 0 while
    // the old marker survives. Pre-fix, batchId <= applied held for
    // every batch and the whole reprocess was silently skipped — pairs
    // would stay at 1 row forever (total data loss). Token-keyed
    // markers read the old one as absent, wipe the derived state, and
    // reprocess cleanly.
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingIngest.startDedupMaintenance(cat, "docs", "lsh_index",
      "pairs", mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      root.resolve("ckptB").toString)
    try {
      mem2.addData(allDocs.take(2): _*); q2.processAllAvailable()
      mem2.addData(allDocs.drop(2): _*); q2.processAllAvailable()
    } finally q2.stop()
    val streamPairs = cat.read("pairs")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ops.Dedup.minhashLsh(
      allDocs.toDF("doc_id", "text"), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs === oneShot)
    assert(cat.read("docs").select("doc_id").distinct().count() === 4L)
  }

  test("sketch maintenance REFUSES a checkpoint reset loudly — counting " +
      "is not idempotent, silent skip and re-absorb are both wrong") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val scratch = java.nio.file.Files.createTempDirectory("cmreset")
    val cat = new graft.catalog.TableCatalog(spark, scratch.resolve("wh").toString)
    val mem1 = MemoryStream[Long]
    val q1 = StreamingIngest.startSketchMaintenance(cat, "cmr",
      mem1.toDF().toDF("k"), "k", scratch.resolve("ckptA").toString,
      depth = 2, width = 16)
    try { mem1.addData(1L, 2L, 3L); q1.processAllAvailable() }
    finally q1.stop()
    val mem2 = MemoryStream[Long]
    val q2 = StreamingIngest.startSketchMaintenance(cat, "cmr",
      mem2.toDF().toDF("k"), "k", scratch.resolve("ckptB").toString,
      depth = 2, width = 16)
    val thrown = intercept[Exception] {
      try { mem2.addData(4L); q2.processAllAvailable() }
      finally q2.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(thrown).exists(c =>
      c.getMessage != null && c.getMessage.contains("different streaming query")),
      s"expected the incarnation guard, got: $thrown")
    // the sketch state itself is untouched by the refused run
    assert(cat.read("cmr").select("applied_batch").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("stream-stream LEFT OUTER join: null row emits only after the watermark closes its window; batch mode identical") {
    implicit val sc = spark.sqlContext
    val txMem = MemoryStream[(String, String, Timestamp)]
    val auMem = MemoryStream[(String, String, Timestamp, String)]
    val q = StreamingIngest.txnWithRecentAuth(
      txMem.toDF().toDF("card_num", "trans_id", "trans_date"),
      auMem.toDF().toDF("card_num", "auth_id", "auth_ts", "auth_result"),
      joinType = "left_outer")
      .writeStream.format("memory").queryName("txauthouter")
      .outputMode("append").start()
    def pairs() = spark.table("txauthouter").collect()
      .map(r => (r.getString(1), Option(r.getString(3)))).toSet
    try {
      // T1 matches A1; TX has NO authorization — its null row must NOT
      // appear until the engine can prove no match can still arrive
      txMem.addData(("K1", "T1", ts("2021-01-01 10:00:00")),
        ("K3", "TX", ts("2021-01-01 10:01:00")))
      auMem.addData(("K1", "A1", ts("2021-01-01 09:55:00"), "OK"))
      q.processAllAvailable()
      assert(pairs() === Set(("T1", Some("A1"))),
        "null-extended row leaked before the watermark closed its window")
      // both sides jump 2 h ahead: watermarks (30 min lag) pass TX's
      // match window end, so the next cycles must emit TX null-extended
      txMem.addData(("K9", "T9", ts("2021-01-01 12:00:00")))
      auMem.addData(("K9", "A9", ts("2021-01-01 12:00:00"), "OK"))
      q.processAllAvailable()
      auMem.addData(("K9", "A9b", ts("2021-01-01 12:30:00"), "OK"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(pairs().contains(("TX", None)),
        "unmatched transaction never emitted after watermark passed")
      assert(pairs() - (("T9", Some("A9b"))) ===
        Set(("T1", Some("A1")), ("T9", Some("A9")), ("TX", None)))
    } finally q.stop()
    // batch mode: plain left outer interval join over the same rows
    val batch = StreamingIngest.txnWithRecentAuth(
      Seq(("K1", "T1", ts("2021-01-01 10:00:00")),
        ("K3", "TX", ts("2021-01-01 10:01:00")))
        .toDF("card_num", "trans_id", "trans_date"),
      Seq(("K1", "A1", ts("2021-01-01 09:55:00"), "OK"))
        .toDF("card_num", "auth_id", "auth_ts", "auth_result"),
      joinType = "left_outer")
      .collect().map(r => (r.getString(1), Option(r.getString(3)))).toSet
    assert(batch === Set(("T1", Some("A1")), ("TX", None)))
  }

  test("dedupTransactions: cross-batch redelivery collapses; batch mode matches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val txns = mem.toDF().toDF("trans_id", "trans_date")
    val q = StreamingIngest.dedupTransactions(txns)
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      mem.addData(("TX1", ts("2021-01-01 10:00:00")), ("TX2", ts("2021-01-01 10:01:00")))
      q.processAllAvailable()
      // the whole first drop is redelivered in a later micro-batch, plus
      // one genuinely new transaction
      mem.addData(("TX1", ts("2021-01-01 10:00:00")), ("TX2", ts("2021-01-01 10:01:00")),
        ("TX3", ts("2021-01-01 10:02:00")))
      q.processAllAvailable()
      assert(spark.table("dedupstream").select("trans_id").collect()
        .map(_.getString(0)).sorted.toSeq === Seq("TX1", "TX2", "TX3"))
    } finally q.stop()
    // batch mode: same surface, plain dropDuplicates
    assert(StreamingIngest.dedupTransactions(
      Seq(("TX1", ts("2021-01-01 10:00:00")), ("TX1", ts("2021-01-01 10:00:00")))
        .toDF("trans_id", "trans_date")).count() === 1)
  }

  test("sessionWindows: boundary gap merges, gap+1 breaks; cross-batch merge through state; batch mode agrees") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val txns = mem.toDF().toDF("card_num", "trans_date")
    val q = StreamingIngest.sessionWindows(txns, gapSeconds = 300L)
      .writeStream.format("memory").queryName("sessstream")
      .outputMode("append").start()
    try {
      // C1: events at 10:00:00 / 10:05:00 (delta == gap → merge), then a
      // second micro-batch continues the SAME session (state merge) and a
      // third event at +301 s breaks it
      mem.addData(("C1", ts("2021-01-01 10:00:00")), ("C1", ts("2021-01-01 10:05:00")))
      q.processAllAvailable()
      mem.addData(("C1", ts("2021-01-01 10:10:00")), ("C1", ts("2021-01-01 10:15:01")))
      q.processAllAvailable()
      // watermark-flush sentinel closes every C1 session
      mem.addData(("FLUSH", ts("2021-01-03 00:00:00")))
      q.processAllAvailable()
      val out = spark.table("sessstream").filter($"card_num" === "C1")
        .collect().map(r => (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
      assert(out === Set(
        (3L, ts("2021-01-01 10:00:00"), ts("2021-01-01 10:10:00")),
        (1L, ts("2021-01-01 10:15:01"), ts("2021-01-01 10:15:01"))))
    } finally q.stop()
    // batch mode on the same events produces the same sessions
    val batch = StreamingIngest.sessionWindows(Seq(
      ("C1", ts("2021-01-01 10:00:00")), ("C1", ts("2021-01-01 10:05:00")),
      ("C1", ts("2021-01-01 10:10:00")), ("C1", ts("2021-01-01 10:15:01")))
      .toDF("card_num", "trans_date"), gapSeconds = 300L)
      .collect().map(r => (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(batch === Set(
      (3L, ts("2021-01-01 10:00:00"), ts("2021-01-01 10:10:00")),
      (1L, ts("2021-01-01 10:15:01"), ts("2021-01-01 10:15:01"))))
  }

  test("velocityAlerts: batch (window) and streaming (stateful) paths agree on a skewed single-card history") {
    implicit val sc = spark.sqlContext
    // one hot card, 5000 txns: alternating cities, mostly 97 s apart with
    // every 100th gap pushed beyond the hour — the batch path must handle
    // the whole card without buffering it as one in-memory group
    var t = Timestamp.valueOf("2021-01-01 00:00:00").getTime
    val rows = (0 until 5000).map { i =>
      t += (if (i % 100 == 99) 7200L else 97L) * 1000L
      ("K1", Seq("Moscow", "Kazan", "Omsk")(i % 3), new Timestamp(t), f"T$i%05d")
    }
    // reference: a plain Scala fold over the sorted history
    val expected = rows.sliding(2).collect {
      case Seq(a, b) if a._2 != b._2 &&
        (b._3.getTime - a._3.getTime) / 1000 <= 3600 =>
        (b._4, a._2, b._2, b._3.getTime / 1000 - a._3.getTime / 1000)
    }.toSet
    assert(expected.size === 4949)   // 4999 successive pairs minus 50 long gaps

    def shape(r: org.apache.spark.sql.Row) =
      (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
    val batchOut = StreamingIngest.velocityAlerts(spark,
      rows.toDF("card_num", "city", "trans_date", "trans_id"))
      .collect().map(shape).toSet
    assert(batchOut === expected)

    val mem = MemoryStream[(String, String, Timestamp, String)]
    val q = StreamingIngest.velocityAlerts(spark,
      mem.toDF().toDF("card_num", "city", "trans_date", "trans_id"))
      .writeStream.format("memory").queryName("skewcard")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      assert(spark.table("skewcard").collect().map(shape).toSet === expected)
    } finally q.stop()
  }

  test("velocityAlerts batch: sub-second timestamps order by the truncated second, matching the stateful path") {
    implicit val sc = spark.sqlContext
    // same truncated second, raw order OPPOSITE to trans_id order: the
    // batch window must sort by (floor-second, trans_id) like the
    // stateful fold, not by the raw timestamp
    val rows = Seq(
      ("K1", "Moscow", new Timestamp(ts("2021-01-01 10:00:05").getTime + 700), "A"),
      ("K1", "Kazan", new Timestamp(ts("2021-01-01 10:00:05").getTime + 200), "B"))
    val shapeCols = Seq("card_num", "trans_id", "prevCity", "city", "deltaSeconds")
    val batch = StreamingIngest.velocityAlerts(spark,
      rows.toDF("card_num", "city", "trans_date", "trans_id"))
      .select(shapeCols.head, shapeCols.tail: _*).collect().toSet
    // truncated order is A(Moscow) then B(Kazan) → the alert is on B
    assert(batch === Set(org.apache.spark.sql.Row("K1", "B", "Moscow", "Kazan", 0L)))
    val mem = MemoryStream[(String, String, Timestamp, String)]
    val q = StreamingIngest.velocityAlerts(spark,
      mem.toDF().toDF("card_num", "city", "trans_date", "trans_id"))
      .writeStream.format("memory").queryName("subsec")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      assert(spark.table("subsec")
        .select(shapeCols.head, shapeCols.tail: _*).collect().toSet === batch)
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
