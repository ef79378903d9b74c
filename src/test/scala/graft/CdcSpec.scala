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

  test("a schema change between the versions is refused loudly") {
    val cat = freshCat()
    val v1 = cat.appendAtomic("t", Seq((1L, 2L)).toDF("k", "v"))
    // rewrite that ADDS a column: v1's files read under v2's schema
    // would null it out and every surviving key would misclassify as
    // an 'update' — the feed refuses instead of lying (r10 review)
    val v2 = cat.replaceAtomic("t",
      Seq((1L, 2L, 9L)).toDF("k", "v", "w"))
    val e = intercept[IllegalArgumentException](
      cat.changesBetween("t", v1, v2, Seq("k")))
    assert(e.getMessage.contains("schema"))
  }
}
