package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.catalog.TableCatalog
import graft.streaming.StreamingIngest
import java.nio.file.Files

/** Audited streaming ingest: micro-batches stage onto a branch (main
  * readers never see an unaudited row), the operator publishes at
  * their own cadence as ONE commit, and a replayed batch stages its
  * rows exactly once. */
class StreamingBranchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("batches stage invisibly; publish lands all of them as one APPEND") {
    val root = Files.createTempDirectory("sbr")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem.toDF().toDF("k", "v"), root.resolve("ckpt").toString)
    try {
      (1 to 3).foreach { b =>
        mem.addData((1 to 10).map(i => ((b * 100 + i).toLong, i.toLong)): _*)
        q.processAllAvailable()
        // main NEVER sees staged rows, whatever the batch count
        assert(cat.read("t").count() === 1L)
      }
      // the audit surface holds seed + all 30 staged rows
      assert(cat.auditBranch("t", "ingest") === 31L)
      // promotion: one commit for three batches
      val v0 = cat.currentVersion("t").get
      cat.publishBranch("t", "ingest")
      assert(cat.currentVersion("t").get === v0 + 1L)
      assert(cat.read("t").count() === 31L)
      // the stream keeps going: a later batch re-creates the branch at
      // the new head and stages there
      mem.addData((900L, 9L))
      q.processAllAvailable()
      assert(cat.read("t").count() === 31L)
      assert(cat.readBranch("t", "ingest").count() === 32L)
    } finally q.stop()
  }

  test("a replayed batch id stages its rows exactly once") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("sbr2").toString)
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    val batch = Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
    cat.appendToBranchBatch("t", "ingest", 7L, batch)
    cat.appendToBranchBatch("t", "ingest", 7L, batch) // the replay
    cat.appendToBranchBatch("t", "ingest", 8L, batch) // a real new batch
    assert(cat.readBranch("t", "ingest").count() === 1L + 2L + 2L)
    cat.publishBranch("t", "ingest")
    assert(cat.read("t").count() === 5L)
    assert(cat.read("t").distinct().count() === 3L) // batch 8 repeats rows, not files
  }

  test("a batch that staged and PUBLISHED before its marker is skipped on " +
      "replay — the ingest gate reads the publish high-water mark") {
    val root = Files.createTempDirectory("sbr4")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem.toDF().toDF("k", "v"), ckpt)
    try {
      mem.addData((1L, 1L)); q.processAllAvailable()
    } finally q.stop()
    val token = StreamingIngest.queryToken(ckpt)
    // the crash window: batch 1 stages its rows but dies before the
    // marker; the operator then publishes everything staged so far
    cat.appendToBranchBatch("t", "ingest", 1L,
      Seq((2L, 2L)).toDF("k", "v"), token = token)
    cat.publishBranch("t", "ingest")
    assert(cat.read("t").count() === 3L)
    // the replayed batch 1 must be SKIPPED (its rows are committed) —
    // the gate the foreachBatch applies before staging
    assert(cat.publishedBranchBatch("t", "ingest", token) === Some(1L))
    // restart on the same checkpoint: the next block becomes batch 1 —
    // in a real crash it carries batch 1's OWN payload, replayed
    val q2 = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem.toDF().toDF("k", "v"), ckpt)
    try {
      mem.addData((2L, 2L)); q2.processAllAvailable() // the replay: skipped
      assert(cat.branches("t").isEmpty, "replayed published batch restaged")
      mem.addData((3L, 3L)); q2.processAllAvailable() // batch 2: stages
    } finally q2.stop()
    cat.publishBranch("t", "ingest")
    assert(cat.read("t").count() === 4L)
    assert(cat.read("t").distinct().count() === 4L) // nothing doubled
  }

  test("the ingest stream gains a column mid-branch: mergeSchema evolves " +
      "the branch and publish lands the union") {
    val root = Files.createTempDirectory("sbr5")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem.toDF().toDF("k", "v"), ckpt, mergeSchema = true)
    try { mem.addData((1L, 1L)); q.processAllAvailable() } finally q.stop()
    // the upstream feed gains a column; the restarted stream (same
    // checkpoint — batch ids continue) stages the wider shape
    val mem2 = MemoryStream[(Long, Long, String)]
    // the fresh MemoryStream restarts its offsets at 0 while the
    // checkpoint committed through offset 1 — burn one block so the
    // payload lands ABOVE the committed offset
    mem2.addData((-1L, -1L, "swallowed"))
    val q2 = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem2.toDF().toDF("k", "v", "s"), ckpt, mergeSchema = true)
    try { mem2.addData((2L, 2L, "x")); q2.processAllAvailable() }
    finally q2.stop()
    val audit = cat.readBranch("t", "ingest")
    assert(audit.columns.toSeq === Seq("k", "v", "s"))
    assert(audit.count() === 3L)
    assert(audit.filter(col("s") === "x").count() === 1L)
    cat.publishBranch("t", "ingest")
    assert(cat.read("t").columns.toSeq === Seq("k", "v", "s"))
    assert(cat.read("t").count() === 3L)
  }

  test("publishEvery promotes staged batches on the loop's own cadence; " +
      "replays stay exactly-once through the self-publishes") {
    val root = Files.createTempDirectory("sbr6")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    cat.addConstraint("t", "k_nonneg", "k >= 0")
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startBranchIngest(cat, "t", "ingest",
      mem.toDF().toDF("k", "v"), root.resolve("ckpt").toString,
      publishEvery = 2)
    try {
      mem.addData((1L, 1L)); q.processAllAvailable() // batch 0: staged
      assert(cat.read("t").count() === 1L)
      assert(cat.branches("t").keySet === Set("ingest"))
      mem.addData((2L, 2L)); q.processAllAvailable() // batch 1: publish
      assert(cat.read("t").count() === 3L, "the 2nd batch must promote")
      assert(cat.branches("t").isEmpty)
      mem.addData((3L, 3L)); q.processAllAvailable() // batch 2: staged
      assert(cat.read("t").count() === 3L)
      mem.addData((4L, 4L)); q.processAllAvailable() // batch 3: publish
      assert(cat.read("t").count() === 5L)
      assert(cat.read("t").distinct().count() === 5L) // nothing doubled
    } finally q.stop()
  }

  test("a constraint-violating batch fails the stage, never the table") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("sbr3").toString)
    cat.replaceAtomic("t", Seq((1L, 1L)).toDF("k", "v"))
    cat.addConstraint("t", "k_pos", "k > 0")
    val e = intercept[Exception] {
      cat.appendToBranchBatch("t", "ingest", 0L, Seq((-5L, 5L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("k_pos"))
    assert(cat.read("t").count() === 1L)
    // a clean retry of the same batch id succeeds and stages once
    cat.appendToBranchBatch("t", "ingest", 0L, Seq((5L, 5L)).toDF("k", "v"))
    assert(cat.auditBranch("t", "ingest") === 2L)
  }
}
