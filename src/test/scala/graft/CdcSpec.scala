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
