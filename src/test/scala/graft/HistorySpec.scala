package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** The commit-history log: one entry per committed version carrying the
  * verb that produced it, TIMESTAMP AS OF resolution against those
  * entries, and the committed-pointer guard on readVersion (an
  * uncommitted `_vN` left by a crashed writer must never be served). */
class HistorySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("hist-cat").toString)

  test("every versioned verb logs its operation, ascending") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    cat.appendAtomic("t", Seq((1000L, 1L)).toDF("k", "v"))
    cat.mergeInto("t", Seq((0L, 99L)).toDF("k", "v"), Seq("k"))
    cat.compactSmallFiles("t")
    cat.optimizeZOrder("t", Seq("k"))
    cat.restore("t", 2L)
    val h = cat.history("t")
      .select(col("version"), col("op"), col("files"), col("bytes"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(h.map(_._1) === (1L to 6L),
      s"one row per committed version, ascending: $h")
    assert(h.map(_._2) === Seq("REPLACE", "APPEND", "MERGE",
      "OPTIMIZE_COMPACT", "OPTIMIZE_ZORDER", "RESTORE"))
    assert(h.forall(e => e._3 > 0L && e._4 > 0L),
      s"files/bytes describe the landed snapshot: $h")
  }

  test("TIMESTAMP AS OF resolves the version committed at that instant") {
    val cat = freshCat()
    val before = System.currentTimeMillis() - 1L
    cat.replaceAtomic("t", Seq((1L, "a")).toDF("k", "s"))
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    cat.replaceAtomic("t", Seq((1L, "b")).toDF("k", "s"))
    val after = System.currentTimeMillis() + 1L
    // before the first commit: nothing existed — refuse, don't guess
    assert(cat.versionAtTimestamp("t", before) === None)
    assert(cat.versionAtTimestamp("t", between) === Some(1L))
    assert(cat.versionAtTimestamp("t", after) === Some(2L))
    // never resolves past the pointer even with a clock probe far ahead
    assert(cat.versionAtTimestamp("t", after + 1000000L) === Some(2L))
  }

  test("readVersion refuses an uncommitted snapshot directory") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 2L)).toDF("k", "v"))
    // a crashed writer's partial _v9 sits on disk, pointer still at 1
    Files.createDirectories(java.nio.file.Paths.get(cat.path("t"), "_v9"))
    val e = intercept[IllegalArgumentException](cat.readVersion("t", 9L))
    assert(e.getMessage.contains("never committed"))
    assert(cat.readVersion("t", 1L).count() === 1L)
  }

  test("a crashed attempt's orphan entry is superseded on retry") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 2L)).toDF("k", "v"))
    // simulate: entry for v2 written, pointer rename never happened
    Files.write(
      java.nio.file.Paths.get(cat.path("t"), "_history",
        "h000000000002-orphan.json"),
      """{"version":2,"tsMillis":123,"op":"REPLACE","files":1,"bytes":10}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the orphan is invisible: history stops at the pointer
    assert(cat.history("t").count() === 1L)
    // the retry commits v2 for real; ONE row for v2, the latest entry
    cat.replaceAtomic("t", Seq((1L, 3L)).toDF("k", "v"))
    val h = cat.history("t").select(col("version")).as[Long].collect().toSeq
    assert(h === Seq(1L, 2L))
  }

  test("rollup compaction bounds the log directory, loses nothing") {
    val cat = freshCat()
    (0 until 30).foreach(i =>
      cat.appendAtomic("t", Seq((i.toLong, i.toLong)).toDF("k", "v")))
    // 30 commits, rollups every 8: the directory must hold ≤ ~8 loose
    // entries + 1 rollup — never the 30-file flat log a feed sync
    // would have to LIST and read on every catch-up
    def listing() = {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(cat.path("t"), "_history")
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    val names = listing()
    assert(names.size <= 10, s"log not compacted: ${names.size} files")
    assert(names.count(_.startsWith("hr")) === 1,
      s"exactly one live rollup expected: $names")
    // the full audit trail survives the folds, in order, ops intact
    val h = cat.history("t")
    assert(h.count() === 30L)
    val ops = h.orderBy("version").select("op").as[String].collect().toSeq
    assert(ops.head === "REPLACE" && ops.tail.forall(_ == "APPEND"),
      s"ops lost in the fold: $ops")
    // TIMESTAMP AS OF still resolves entries that now live in the rollup
    val ts5 = cat.history("t").filter(col("version") === 5)
      .select("ts_millis").as[Long].head()
    assert(cat.versionAtTimestamp("t", ts5).exists(_ >= 5L))
    // and the dataChange=false proof still reads folded ops: an
    // OPTIMIZE followed by appends keeps the feed O(delta) across it
    cat.compactSmallFiles("t")
    cat.appendAtomic("t", Seq((99L, 99L)).toDF("k", "v"))
    val (_, _, added, removed) =
      cat.changedRowsBetween("t", 30L, cat.currentVersion("t").get)
    assert(removed.isEmpty && added.size === 1,
      s"layout skip broke across the rollup: +${added.size}/-${removed.size}")
  }
}
