package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.etl.SnapshotDiff
import java.nio.file.{Files, Paths}

/** appendAtomic + changesBetween — the O(delta) change-data-feed pair
  * (VERDICT r9 next #2): a versioned append shares the previous
  * snapshot's files by hard link, so the feed between two versions
  * reads only the added/removed files; a full rewrite shares nothing
  * and the feed degrades to exactly SnapshotDiff.changes over both
  * complete snapshots. */
class CdcSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("cdc-cat").toString)

  test("appendAtomic shares prior files by link and costs O(new data)") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t",
      (0 until 5000).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
        .repartition(4))
    val v2 = cat.appendAtomic("t",
      (5000 until 5100).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v"))
    assert(v2 === v1 + 1)
    assert(cat.read("t").count() === 5100L)
    // the carried-over files are the SAME inodes (hard links), under
    // the same names — no bytes were copied for the old 5000 rows
    def names(v: Long) = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(cat.path("t"), s"_v$v"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    val shared = names(v1).intersect(names(v2))
    assert(shared === names(v1), "every v1 file must carry into v2")
    shared.foreach { n =>
      val a = Files.readAttributes(
        Paths.get(cat.path("t"), s"_v$v1", n),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      val b = Files.readAttributes(
        Paths.get(cat.path("t"), s"_v$v2", n),
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      assert(a === b, s"$n was copied, not linked")
    }
    // time travel still resolves both versions independently
    assert(cat.readVersion("t", v1).count() === 5000L)
    // a plain table refuses the verb (appendAtomic must never shadow)
    cat.append("p", Seq((1L, 1L)).toDF("k", "v"))
    assertThrows[IllegalArgumentException](
      cat.appendAtomic("p", Seq((2L, 2L)).toDF("k", "v")))
  }

  test("changesBetween over an append is O(delta): only new files read") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t",
      (0 until 5000).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
        .repartition(4))
    val v2 = cat.appendAtomic("t",
      (5000 until 5100).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
        .repartition(1))
    val feed = cat.changesBetween("t", v1, v2, Seq("k"))
    // O(delta) pinned: the plan's inputs are exactly the ONE appended
    // file — none of v1's four carried-over files is opened
    assert(feed.inputFiles.length === 1,
      s"read ${feed.inputFiles.length} files for a 1-file delta")
    val rows = feed.as[(Long, String, Long)].collect()
    assert(rows.length === 100)
    assert(rows.forall(_._2 == "insert"))
    assert(rows.map(_._1).toSet === (5000L until 5100L).toSet)
  }

  test("a rewrite degrades to the full SnapshotDiff (fallback equality)") {
    val cat = freshCat()
    val base = (0 until 1000).map(i => (i.toLong, i.toLong % 50)).toDF("k", "v")
    val v1 = cat.appendAtomic("t", base)
    // full rewrite: delete k%10==0, bump v where k%7==0
    val next = base.filter(col("k") % 10 =!= 0)
      .withColumn("v", when(col("k") % 7 === 0, col("v") + 1000)
        .otherwise(col("v")))
    val v2 = cat.replaceAtomic("t", next)
    // Option decode: deletes carry NULL values by contract
    val feed = cat.changesBetween("t", v1, v2, Seq("k"))
      .as[(Long, String, Option[Long])].collect().toSet
    val oracle = SnapshotDiff.changes(
      cat.readVersion("t", v1), cat.readVersion("t", v2), Seq("k"), Seq("v"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(feed === oracle)
    // and the classification itself is right
    assert(feed.count(_._2 == "delete") === 100)
    assert(feed.count(_._2 == "update") ===
      (0 until 1000).count(k => k % 7 == 0 && k % 10 != 0))
    assert(feed.count(_._2 == "insert") === 0)
  }

  test("bad inputs fail loudly: order, pruned version, missing key") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t", Seq((1L, 2L)).toDF("k", "v"))
    val v2 = cat.appendAtomic("t", Seq((2L, 3L)).toDF("k", "v"))
    assertThrows[IllegalArgumentException](
      cat.changesBetween("t", v2, v1, Seq("k")))
    assertThrows[IllegalArgumentException](
      cat.changesBetween("t", 99L, v2, Seq("k")))
    assertThrows[IllegalArgumentException](
      cat.changesBetween("t", v1, v2, Seq("nope")))
  }

  test("a maintenance-only interval answers from metadata: zero files read") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t",
      (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
        .repartition(6))
    cat.compactSmallFiles("t")
    val v2 = cat.currentVersion("t").get
    assert(v2 === v1 + 1)
    val (ins, del, added, removed) = cat.changedRowsBetween("t", v1, v2)
    // OPTIMIZE renamed every file, but the commit is dataChange=false:
    // the endpoint shrink proves content equality from the history ops
    // and never opens the rewritten files
    assert(added.isEmpty && removed.isEmpty)
    assert(ins.inputFiles.isEmpty && del.inputFiles.isEmpty)
    assert(cat.changesBetween("t", v1, v2, Seq("k")).count() === 0L)
  }

  test("an interior OPTIMIZE is skipped: append-optimize-append reads two appends") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t",
      (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
        .repartition(4))
    cat.appendAtomic("t",
      (2000 until 2100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
        .repartition(2))
    cat.compactSmallFiles("t") // renames EVERYTHING, changes nothing
    val v4 = cat.appendAtomic("t",
      (2100 until 2200).map(i => (i.toLong, i.toLong)).toDF("k", "v")
        .repartition(2))
    val (ins, del, added, removed) = cat.changedRowsBetween("t", v1, v4)
    // the direct v1-vs-v4 name diff would see every post-compaction name
    // as new and re-read the whole table; the per-step compose reads
    // exactly the two appended increments
    assert(removed.isEmpty, s"compaction leaked removals: $removed")
    assert(added.size === 4, s"expected the 4 appended files, got $added")
    assert(del.inputFiles.isEmpty)
    assert(ins.count() === 200L)
    // classified feed still equals the full-snapshot SnapshotDiff
    val feed = cat.changesBetween("t", v1, v4, Seq("k"))
    val full = SnapshotDiff.changes(
      cat.readVersion("t", v1), cat.readVersion("t", v4), Seq("k"), Seq("v"))
    assert(feed.orderBy("k").collect().toSeq ===
      full.orderBy("k").collect().toSeq)
  }

  test("a contentful rewrite after an OPTIMIZE still reports the rewrite") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t",
      (0 until 500).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.compactSmallFiles("t")
    val v3 = cat.replaceAtomic("t",
      (0 until 500).map(i => (i.toLong, if (i % 5 == 0) i + 1L else i.toLong))
        .toDF("k", "v"))
    val feed = cat.changesBetween("t", v1, v3, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("change_type"))))
    assert(feed.count(_._2 == "update") === 100)
    assert(feed.count(_._2 == "insert") === 0)
    assert(feed.count(_._2 == "delete") === 0)
  }

  test("additive evolution null-fills the feed; a TYPE change stays refused") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t", Seq((1L, 2L), (2L, 5L)).toDF("k", "v"))
    // a rewrite that ADDS a column: old rows null-fill it, so the feed
    // classifies truthfully under the new shape — k=1 gained a w value
    // (update), k=2's w is NULL on both sides (no change). Pre-r11 this
    // interval forced an O(table) resync by refusing.
    val v2 = cat.replaceAtomic("t",
      Seq((1L, 2L, Some(9L)), (2L, 5L, None: Option[Long]))
        .toDF("k", "v", "w"))
    val feed = cat.changesBetween("t", v1, v2, Seq("k")).collect()
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("change_type"))))
    assert(feed.toSet === Set((1L, "update")), s"got ${feed.toSeq}")
    // a TYPE change has no honest mapping: still refused loudly
    val v3 = cat.replaceAtomic("t",
      Seq((1L, "2", Some(9L))).toDF("k", "v", "w"))
    val e = intercept[IllegalArgumentException](
      cat.changesBetween("t", v2, v3, Seq("k")))
    assert(e.getMessage.contains("TYPES"))
  }

  test("the feed survives a RENAME: removed files re-bind by field id") {
    val cat = freshCat()
    val v1 = cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cat.renameColumn("t", "v", "w")
    // a metadata-only rename ships NOTHING: same file names hard-linked
    val v2 = cat.currentVersion("t").get
    val (_, _, added, removed) = cat.changedRowsBetween("t", v1, v2)
    assert(added.isEmpty && removed.isEmpty,
      "a rename must be O(0) in the feed — the bytes never moved")
    // a rewrite through the NEW name: the removed side holds files whose
    // physical column is still 'v' — classification re-binds them by id
    val v3 = cat.replaceAtomic("t", Seq((1L, 10L), (2L, 99L)).toDF("k", "w"))
    val feed = cat.changesBetween("t", v1, v3, Seq("k"))
    assert(feed.columns.contains("w"), s"feed shape: ${feed.columns.toSeq}")
    val got = feed.collect().map(r => (r.getLong(r.fieldIndex("k")),
      r.getString(r.fieldIndex("change_type")),
      if (r.isNullAt(r.fieldIndex("w"))) -1L else r.getLong(r.fieldIndex("w"))))
    assert(got.toSet === Set((2L, "update", 99L)), s"got ${got.toSeq}")
    // an append through the new name feeds as a plain O(delta) insert
    cat.appendAtomic("t", Seq((3L, 30L)).toDF("k", "w"))
    val f2 = cat.changesBetween("t", v3, cat.currentVersion("t").get, Seq("k"))
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("change_type"))))
    assert(f2.toSet === Set((3L, "insert")))
  }
}
