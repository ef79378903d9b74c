package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.streaming.ChangeFeed
import java.nio.file.{Files, Paths}

/** The change-feed consumer loop: initial-snapshot bootstrap, O(delta)
  * catch-ups, at-least-once replay convergence (the offset commits
  * after the handler), horizon-loss fallback, and the poll daemon. */
class ChangeFeedSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def fresh(): (TableCatalog, java.nio.file.Path) = {
    val root = Files.createTempDirectory("cdcfeed")
    (new TableCatalog(spark, root.resolve("wh").toString),
      root.resolve("offsets/src.offset"))
  }

  private def rows(cat: TableCatalog, t: String): Set[(Long, Long)] =
    cat.read(t).select(col("k"), col("v")).as[(Long, Long)].collect().toSet

  test("bootstrap, append delta, rewrite delta, then fresh") {
    val (cat, ckpt) = fresh()
    cat.replaceAtomic("src", (0 until 50).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    // first sync: full current snapshot as inserts, offset pins
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Resync(1L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    // append-only commit: the O(delta) path
    cat.appendAtomic("src", (50 until 60).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    // full rewrite with updates + deletes + an insert
    val next = cat.read("src")
      .filter(col("k") % 10 =!= 0)                      // deletes
      .withColumn("v", when(col("k") % 7 === 0, col("v") + 1000)
        .otherwise(col("v")))                           // updates
      .unionByName(Seq((999L, 999L)).toDF("k", "v"))    // insert
    cat.replaceAtomic("src", next)
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Delta(2L, 3L))
    assert(rows(cat, "dst") === rows(cat, "src"))
    // caught up: no handler call, no commit on dst
    val dstV = cat.currentVersion("dst")
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Fresh)
    assert(cat.currentVersion("dst") === dstV)
  }

  test("a replayed range reconverges (at-least-once → exactly-once)") {
    val (cat, ckpt) = fresh()
    cat.replaceAtomic("src", (0 until 30).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt)
    cat.replaceAtomic("src", cat.read("src")
      .filter(col("k") =!= 3).withColumn("v", col("v") + 1))
    ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt)
    assert(rows(cat, "dst") === rows(cat, "src"))
    // simulate the crash window: the offset file regresses to v1, so
    // the SAME (1,2] range replays onto the already-updated replica —
    // retire-then-reinsert must land on identical content
    Files.write(ckpt, "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
  }

  test("a failing handler leaves the offset unmoved") {
    val (cat, ckpt) = fresh()
    cat.replaceAtomic("src", Seq((1L, 1L)).toDF("k", "v"))
    ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt)
    cat.appendAtomic("src", Seq((2L, 2L)).toDF("k", "v"))
    assertThrows[RuntimeException] {
      ChangeFeed.sync(cat, "src", Seq("k"), ckpt) { (_, _) =>
        throw new RuntimeException("consumer died mid-apply")
      }
    }
    // the range is replayed, not lost
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Delta(1L, 2L))
    assert(rows(cat, "dst") === rows(cat, "src"))
  }

  test("horizon loss: lapped consumer resyncs, or fails when told to") {
    val root = Files.createTempDirectory("cdclap")
    // retention 0: only current + previous snapshots survive a commit
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      snapshotRetentionMs = 0L)
    val ckpt = root.resolve("src.offset")
    cat.replaceAtomic("src", Seq((1L, 1L)).toDF("k", "v"))
    ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt)
    // three more commits: v1 ages out, the consumer is lapped
    (2 to 4).foreach(i =>
      cat.replaceAtomic("src", Seq((i.toLong, i.toLong)).toDF("k", "v")))
    assert(cat.versions("src").min > 1L, "v1 must have been pruned")
    assertThrows[IllegalStateException] {
      ChangeFeed.sync(cat, "src", Seq("k"), ckpt,
        onHorizonLoss = ChangeFeed.FailOnLoss) { (_, _) => () }
    }
    assert(ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt) ===
      ChangeFeed.Resync(4L))
    assert(rows(cat, "dst") === rows(cat, "src"))
  }

  test("the poll daemon catches up on its own and stops cleanly") {
    val (cat, ckpt) = fresh()
    cat.replaceAtomic("src", (0 until 20).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    val h = ChangeFeed.start(cat, "src", Seq("k"), ckpt, intervalMs = 100L) {
      () => ChangeFeed.mirror(cat, "src", "dst", Seq("k"), ckpt); ()
    }
    try {
      // a probe can race the daemon's in-flight bootstrap commit (dir
      // present, pointer not yet) — a throwing probe is "not yet"
      def eventually(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 30000L
        def ok: Boolean = try cond catch { case _: Exception => false }
        while (!ok && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(ok)
      }
      eventually(cat.currentVersion("dst").isDefined &&
        rows(cat, "dst") === (0 until 20).map(i => (i.toLong, i.toLong)).toSet)
      cat.appendAtomic("src", Seq((100L, 100L)).toDF("k", "v"))
      eventually(rows(cat, "dst").contains((100L, 100L)))
      assert(h.lastError.isEmpty, s"daemon error: ${h.lastError}")
    } finally h.stop()
    assert(!h.isAlive)
  }

  test("shipFeed: stock Structured Streaming tails the shipped feed") {
    val (cat, ckpt) = fresh()
    val feedDir = ckpt.getParent.resolve("feed")
    cat.replaceAtomic("src", (0 until 40).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    assert(ChangeFeed.shipFeed(cat, "src", Seq("k"), feedDir, ckpt) ===
      ChangeFeed.Resync(1L))
    cat.appendAtomic("src", (40 until 50).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    cat.compactSmallFiles("src") // dataChange=false: must ship NOTHING
    cat.replaceAtomic("src", cat.read("src").filter(col("k") =!= 0)
      .localCheckpoint(true))
    assert(ChangeFeed.shipFeed(cat, "src", Seq("k"), feedDir, ckpt) ===
      ChangeFeed.Delta(1L, 4L))
    def dirs() = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(feedDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("commit_version=")).toSet finally s.close()
    }
    assert(dirs() === Set("commit_version=1", "commit_version=2",
      "commit_version=4"), s"got ${dirs()}") // v=3 OPTIMIZE shipped nothing
    // a replay (lost checkpoint) never double-ships a file
    Files.delete(ckpt)
    val before = spark.read.parquet(feedDir.toString).inputFiles.toSet
    ChangeFeed.shipFeed(cat, "src", Seq("k"), feedDir, ckpt)
    assert(spark.read.parquet(feedDir.toString).inputFiles.toSet === before)
    // the stock file source tails it: no custom source, exactly-once
    val sch = spark.read.parquet(feedDir.toString).schema
    val outDir = ckpt.getParent.resolve("out")
    val q = spark.readStream.schema(sch).parquet(feedDir.toString)
      .writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation",
        ckpt.getParent.resolve("stream_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(outDir.toString)
    // commit 1: 40 inserts; commit 2: 10 inserts; commit 4: 1 delete
    assert(got.count() === 51L)
    val del = got.filter(col("change_type") === "delete").collect()
    assert(del.map(_.getLong(del.head.fieldIndex("k"))).toSeq === Seq(0L))
    assert(del.forall(_.isNullAt(del.head.fieldIndex("v")))) // feed contract
    assert(got.filter(col("commit_version") === 4).count() === 1L)
  }
}
