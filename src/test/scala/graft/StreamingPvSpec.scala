package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.catalog.TableCatalog
import graft.streaming.StreamingIngest
import java.nio.file.Files

/** Exactly-once streaming sinks into PARTITIONED facts (r14 verdict
  * next #3): each micro-batch lands once — into a pv fact as one
  * snapshot commit with history-stamped provenance, or into a plain
  * partitioned fact under batch-scoped names with a write-ahead leaf
  * intent. Replays add zero rows; kill/resume converges. */
class StreamingPvSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def pvFact(cat: TableCatalog, t: String): Unit =
    cat.createPartitionedVersioned(t,
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))

  test("pv streaming append: 3 micro-batches ≡ the batch append, one " +
      "snapshot commit each, atomic to readers") {
    val root = Files.createTempDirectory("spv")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    pvFact(cat, "f")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startPartitionedVersionedAppend(cat, "f",
      mem.toDF().toDF("k", "dt"), root.resolve("ckpt").toString)
    try {
      (1 to 3).foreach { b =>
        mem.addData((1 to 5).map(i =>
          ((b * 100 + i).toLong, s"2024-01-0$b")): _*)
        q.processAllAvailable()
      }
      assert(cat.read("f").count() === 15L)
      assert(cat.read("f").select("dt").distinct().count() === 3L)
      // one commit per batch: create + 3 appends
      assert(cat.currentVersion("f") === Some(4L))
      // every commit carries the stream's provenance stamp
      assert(cat.history("f").filter(col("op") === "APPEND").count() === 3L)
      // leaf pruning serves the streamed head
      assert(cat.read("f").filter($"dt" === "2024-01-02").count() === 5L)
    } finally q.stop()
  }

  test("a replayed pv batch adds ZERO rows — the history stamp is the " +
      "correctness path, not the marker") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("spv2").toString)
    pvFact(cat, "f")
    val rows = Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "dt")
    val v1 = cat.appendPartitionedVersionedBatch("f", rows, 7L, "tok")
    // the crash window: the marker never landed, the stream replays
    // batch 7 — the commit's own stamp must no-op it
    val v2 = cat.appendPartitionedVersionedBatch("f", rows, 7L, "tok")
    assert(v1 === v2, "a replay must not commit a new snapshot")
    assert(cat.read("f").count() === 2L)
    // a genuinely new batch still lands
    cat.appendPartitionedVersionedBatch("f",
      Seq((3L, "2024-01-03")).toDF("k", "dt"), 8L, "tok")
    assert(cat.read("f").count() === 3L)
    // the stamp survives history compaction (compaction runs every 8
    // commits; force several more and re-check the replay still skips)
    (9L to 18L).foreach(b => cat.appendPartitionedVersionedBatch("f",
      Seq((b * 10, "2024-01-04")).toDF("k", "dt"), b, "tok"))
    val n = cat.read("f").count()
    cat.appendPartitionedVersionedBatch("f", rows, 7L, "tok") // late replay
    assert(cat.read("f").count() === n,
      "the provenance stamp must outlive history compaction")
  }

  test("pv streaming kill/resume from the checkpoint converges — no " +
      "duplicates, no losses") {
    val root = Files.createTempDirectory("spv3")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    pvFact(cat, "f")
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startPartitionedVersionedAppend(cat, "f",
      mem.toDF().toDF("k", "dt"), ckpt)
    try {
      mem.addData((1L, "2024-01-01"), (2L, "2024-01-01"))
      q.processAllAvailable()
    } finally q.stop()
    assert(cat.read("f").count() === 2L)
    // resume from the SAME checkpoint with a fresh source. The fresh
    // MemoryStream restarts its offsets at 0 while the checkpoint
    // already committed batch 0 — so the first chunk REPLAYS as batch
    // 0, and the skip (token = the checkpoint's query id, carried
    // across the restart) must hold: no duplicates of batch 0's rows,
    // no spurious commit
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((3L, "2024-01-02"))
    val q2 = StreamingIngest.startPartitionedVersionedAppend(cat, "f",
      mem2.toDF().toDF("k", "dt"), ckpt)
    try {
      q2.processAllAvailable()
      assert(cat.read("f").count() === 2L,
        "the replayed batch id must skip across the restart")
      // the next chunk is a genuinely new batch id and lands once
      mem2.addData((4L, "2024-01-03"))
      q2.processAllAvailable()
      assert(cat.read("f").count() === 3L)
      assert(cat.read("f").distinct().count() === 3L)
      assert(cat.read("f").filter($"k" === 4L).count() === 1L)
    } finally q2.stop()
  }

  test("plain partitioned streaming append: batch-scoped names, " +
      "write-ahead leaf intent; a replay sweeps only its prior leaves") {
    val root = Files.createTempDirectory("spp")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.createPartitioned("p", Seq((0L, "x")).toDF("k", "dt").schema,
      Seq("dt"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startPartitionedAppend(cat, "p",
      mem.toDF().toDF("k", "dt"), root.resolve("ckpt").toString)
    try {
      mem.addData((1L, "2024-01-01"), (2L, "2024-01-02"))
      q.processAllAvailable()
      mem.addData((3L, "2024-01-01"))
      q.processAllAvailable()
      assert(cat.readPartitioned("p").count() === 3L)
    } finally q.stop()
    // direct replay of a batch id with DIFFERENT rows: the intent
    // sidecar names the prior leaves, the sweep clears them, the new
    // landing is the only one — exactly-once in itself
    cat.insertPartitionedBatch("p",
      Seq((10L, "2024-01-05"), (11L, "2024-01-06")).toDF("k", "dt"),
      99L, "tok")
    cat.insertPartitionedBatch("p",
      Seq((10L, "2024-01-05")).toDF("k", "dt"), 99L, "tok")
    val d = cat.readPartitioned("p")
    assert(d.filter($"dt" >= "2024-01-05").count() === 1L,
      "the replay must sweep its prior landing from every touched leaf")
    assert(d.count() === 4L)
    // a lazily-evolved table routes batch landings into the CURRENT
    // generation; intents record table-relative leaves so replays
    // sweep across the generation subtree too
    cat.addColumnsPartitioned("p", Seq(
      org.apache.spark.sql.types.StructField("m",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    cat.repartitionTableLazy("p",
      Seq(("identity", "dt", 0), ("identity", "m", 0)))
    cat.insertPartitionedBatch("p",
      Seq((20L, "2024-02-01", 1), (21L, "2024-02-02", 2))
        .toDF("k", "dt", "m"), 100L, "tok")
    cat.insertPartitionedBatch("p",
      Seq((20L, "2024-02-01", 1)).toDF("k", "dt", "m"), 100L, "tok")
    assert(cat.readPartitioned("p").filter($"dt" >= "2024-02-01")
      .count() === 1L, "the multi-generation replay must sweep too")
    assert(Files.exists(java.nio.file.Paths.get(
      cat.path("p"), "_g1", "dt=2024-02-01", "m=1")),
      "the landing must nest in the current generation's layout")
  }

  test("streaming WAP composes with pv: batches stage onto a branch of " +
      "a partitioned versioned fact, publish lands them as one commit") {
    val root = Files.createTempDirectory("spw")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    pvFact(cat, "f")
    cat.appendPartitionedVersioned("f", Seq((0L, "2024-01-01")).toDF("k", "dt"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingIngest.startBranchIngest(cat, "f", "ingest",
      mem.toDF().toDF("k", "dt"), root.resolve("ckpt").toString)
    try {
      (1 to 3).foreach { b =>
        mem.addData((1 to 4).map(i =>
          ((b * 100 + i).toLong, s"2024-01-0$b")): _*)
        q.processAllAvailable()
        assert(cat.read("f").count() === 1L, "staged rows leaked to main")
      }
      assert(cat.auditBranch("f", "ingest") === 13L)
      val v0 = cat.currentVersion("f").get
      cat.publishBranch("f", "ingest")
      assert(cat.currentVersion("f").get === v0 + 1L)
      assert(cat.read("f").count() === 13L)
      assert(cat.read("f").distinct().count() === 13L)
    } finally q.stop()
  }

  test("a LAZY spec evolution mid-stream: later batches route into the " +
      "new generation's subtree, replays stay exactly-once across the " +
      "boundary, and the union read serves every batch (r16)") {
    val root = Files.createTempDirectory("spv-ev")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.createPartitionedVersioned("f",
      Seq((0L, "x", 0)).toDF("k", "dt", "h").schema, Seq("dt"))
    val rowsA = Seq((1L, "2024-01-01", 1), (2L, "2024-01-02", 2))
      .toDF("k", "dt", "h")
    cat.appendPartitionedVersionedBatch("f", rowsA, 0L, "tok")
    // the evolution: new batches partition by (dt, h)
    cat.repartitionTableLazy("f",
      Seq(("identity", "dt", 0), ("identity", "h", 0)))
    val rowsB = Seq((3L, "2024-01-01", 3), (4L, "2024-01-03", 4))
      .toDF("k", "dt", "h")
    val vB = cat.appendPartitionedVersionedBatch("f", rowsB, 1L, "tok")
    assert(Files.exists(java.nio.file.Paths.get(cat.path("f"),
      s"_v$vB", "_g1", "dt=2024-01-01", "h=3")),
      "post-evolution batches must nest in the new generation")
    // replays of BOTH sides of the boundary add zero rows
    cat.appendPartitionedVersionedBatch("f", rowsA, 0L, "tok")
    cat.appendPartitionedVersionedBatch("f", rowsB, 1L, "tok")
    assert(cat.read("f").count() === 4L, "replays must no-op")
    assert(cat.read("f").filter($"dt" === "2024-01-01").count() === 2L,
      "the union read serves both generations' leaves")
    // and the whole thing compacts into one layout with nothing lost
    cat.compactGenerationsVersioned("f")
    assert(cat.read("f").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    // a late replay after compaction still no-ops (the stamp rides
    // the history log, not the snapshot tree)
    cat.appendPartitionedVersionedBatch("f", rowsB, 1L, "tok")
    assert(cat.read("f").count() === 4L)
  }
}
