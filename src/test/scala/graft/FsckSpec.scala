package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** The read-only integrity checker (r16): a healthy table answers
  * CLEAN; every injected crash residue class surfaces as the right
  * severity with the healing verb named — and fsck itself never
  * repairs, locks, or scans data. */
class FsckSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("fsck").toString
    seq += 1
    val name = s"gfsck$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("a healthy table — flat versioned and partitioned versioned — " +
      "answers clean, from Scala and SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("flat", (1 to 10).map(i => (i.toLong, i)).toDF("k", "v"))
    cat.appendAtomic("flat", Seq((11L, 11)).toDF("k", "v"))
    assert(cat.fsck("flat") === Seq.empty)
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "dt"))
    assert(cat.fsck("pv") === Seq.empty)
    assert(spark.sql(s"CALL $g.system.fsck('pv')").count() === 0L)
  }

  test("manifest drift surfaces as errors/warns: a missing manifested " +
      "file is an error, an unmanifested stray is a warn") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    val v = cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    val leaf = Paths.get(cat.path("pv"), s"_v$v", "dt=2024-01-01")
    // stray: a parquet file the manifest does not carry
    val stray = leaf.resolve("stray-part.parquet")
    Files.write(stray, Array[Byte](1, 2, 3))
    val r1 = cat.fsck("pv")
    assert(r1.exists(x => x._1 == "warn" && x._2 == "unmanifested_file" &&
      x._3.contains("stray-part.parquet")), r1.toString)
    Files.delete(stray)
    // hole: delete a manifested file
    import scala.jdk.CollectionConverters._
    val s = Files.list(leaf)
    val f = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally s.close()
    Files.delete(f)
    val r2 = cat.fsck("pv")
    assert(r2.exists(x => x._1 == "error" &&
      x._2 == "manifest_file_missing"), r2.toString)
  }

  test("crash residue classes report with the healing verb: stale and " +
      "committed collapse intents, orphan publish intents, orphan " +
      "branch dirs, scratch") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy("pv",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    // stale pre-commit collapse intent
    val specFile = Paths.get(cat.path("pv"), "_partspec.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(new String(Files.readAllBytes(specFile), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("collapseAt", cat.currentVersion("pv").get + 1L)
    node.put("collapsePub", "gc-dead")
    Files.write(specFile, om.writeValueAsString(node).getBytes("UTF-8"))
    val cat2 = new TableCatalog(spark,
      Paths.get(cat.path("pv")).getParent.toString)
    val r = cat2.fsck("pv")
    assert(r.exists(x => x._1 == "info" && x._2 == "collapse_intent" &&
      x._3.contains("stale")), r.toString)
    // orphan publish intent + orphan branch dir + scratch residue
    Files.write(Paths.get(cat2.path("pv"), "_brpend_ghost"),
      "{}".getBytes("UTF-8"))
    Files.createDirectories(
      Paths.get(cat2.path("pv"), "_branchdata_ghost-e1"))
    Files.createDirectories(
      Paths.get(cat2.path("pv"), "_tmp_ins-deadbeef"))
    val r2 = cat2.fsck("pv")
    assert(r2.exists(x => x._1 == "warn" && x._2 == "publish_intent"),
      r2.toString)
    assert(r2.exists(x => x._1 == "warn" && x._2 == "orphan_branch_dir"),
      r2.toString)
    assert(r2.exists(x => x._1 == "info" && x._2 == "scratch"),
      r2.toString)
    // a LIVE branch's pend reports as info, not warn
    cat2.appendToBranch("pv", "wap",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    Files.write(Paths.get(cat2.path("pv"), "_brpend_wap"),
      "{}".getBytes("UTF-8"))
    val r3 = cat2.fsck("pv")
    assert(r3.exists(x => x._1 == "info" && x._2 == "publish_intent" &&
      x._3.contains("'wap'")), r3.toString)
    Files.delete(Paths.get(cat2.path("pv"), "_brpend_wap"))
    cat2.dropBranch("pv", "wap")
  }

  test("fsck never mutates: the findings are identical across calls " +
      "and the table keeps serving") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    Files.createDirectories(Paths.get(cat.path("pv"), "_tmp_ins-x"))
    val a = cat.fsck("pv")
    val b = cat.fsck("pv")
    assert(a === b)
    assert(Files.exists(Paths.get(cat.path("pv"), "_tmp_ins-x")),
      "fsck must not clean anything (that is vacuum's job)")
    assert(cat.read("pv").count() === 1L)
  }
}
