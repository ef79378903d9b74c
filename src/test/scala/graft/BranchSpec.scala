package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** Write-audit-publish branches: staged appends main readers never
  * see, audited under the table's own constraints, published as one
  * versioned APPEND that rebases onto a moved head. */
class BranchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("br-cat").toString)

  test("branch writes are invisible to main until publish; publish lands them") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 10).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((100L, 100L), (101L, 101L)).toDF("k", "v"))
    assert(cat.read("t").count() === 10L) // isolation
    assert(cat.readBranch("t", "wap").count() === 12L) // the audit surface
    assert(cat.branches("t") === Map("wap" -> 1L))
    val v = cat.publishBranch("t", "wap")
    assert(v === 2L)
    assert(cat.read("t").count() === 12L)
    assert(cat.branches("t").isEmpty) // consumed
    // history records the publish as its own op
    assert(cat.history("t").filter(col("op") === "PUBLISH").count() === 1L)
  }

  test("publish rebases onto a head that moved past the branch's base") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((100L, 100L)).toDF("k", "v"))
    // main moves twice while the branch is staged
    cat.appendAtomic("t", Seq((50L, 50L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((51L, 51L)).toDF("k", "v"))
    val v = cat.publishBranch("t", "wap")
    assert(v === 4L)
    // everything landed: base rows, both main appends, the branch row
    assert(cat.read("t").count() === 8L)
    assert(cat.read("t").filter(col("k") === 100L).count() === 1L)
    assert(cat.read("t").filter(col("k") === 51L).count() === 1L)
  }

  test("a violating branch write refuses at the stage, not at publish") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.addConstraint("t", "k_pos", "k > 0")
    val e = intercept[Exception] {
      cat.appendToBranch("t", "wap", Seq((-1L, 0L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("k_pos"))
    // the refused write may leave part-files behind; audit and publish
    // of whatever DID land still hold the invariant
    assert(cat.read("t").count() === 5L)
  }

  test("a constraint added mid-branch judges the staged rows at publish") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((-7L, 7L)).toDF("k", "v"))
    cat.addConstraint("t", "k_pos", "k > 0") // after the stage
    val e = intercept[Exception] { cat.publishBranch("t", "wap") }
    assert(e.getMessage.contains("k_pos"))
    assert(cat.read("t").count() === 5L) // nothing published
    // auditBranch reports the same violation — the WAP loop catches it
    val e2 = intercept[Exception] { cat.auditBranch("t", "wap") }
    assert(e2.getMessage.contains("k_pos"))
    cat.dropBranch("t", "wap")
    assert(cat.branches("t").isEmpty)
  }

  test("a rename mid-branch stales the branch's stamps: publish refuses, re-stage works") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((100L, 100L)).toDF("k", "v"))
    cat.renameColumn("t", "v", "v2")
    val e = intercept[Exception] { cat.publishBranch("t", "wap") }
    assert(e.getMessage.contains("re-stage"))
    cat.dropBranch("t", "wap")
    cat.appendToBranch("t", "wap", Seq((100L, 100L)).toDF("k", "v2"))
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 6L)
    assert(cat.read("t").filter(col("v2") === 100L).count() === 1L)
  }

  test("an open branch pins its base snapshot past retention") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("br-ret").toString, snapshotRetentionMs = 0L)
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((100L, 100L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((50L, 50L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((51L, 51L)).toDF("k", "v"))
    // retention 0 would normally have swept v1 (the branch's base)
    assert(cat.versions("t").contains(1L))
    assert(cat.readBranch("t", "wap").count() === 4L) // still auditable
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 6L)
  }

  test("branch schema must match its declaration; empty publish is a no-op") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((9L, 9L)).toDF("k", "v"))
    val e = intercept[Exception] {
      cat.appendToBranch("t", "wap", Seq((9L, "x")).toDF("k", "s"))
    }
    assert(e.getMessage.contains("align the columns"))
    cat.dropBranch("t", "wap")
    // an empty branch (zero rows staged): publish adds nothing and
    // consumes the branch — whether it lands a zero-row commit or
    // short-circuits is an implementation detail
    cat.appendToBranch("t", "empty", spark.emptyDataset[(Long, Long)].toDF("k", "v"))
    val n0 = cat.read("t").count()
    cat.publishBranch("t", "empty")
    assert(cat.read("t").count() === n0)
    assert(cat.branches("t").isEmpty)
    // no branch residue on disk
    val s = Files.list(Paths.get(cat.path("t")))
    try {
      import scala.jdk.CollectionConverters._
      assert(!s.iterator().asScala.exists(p =>
        p.getFileName.toString.startsWith("_branch")))
    } finally s.close()
  }

  test("expireBranches drops stale branches and frees their base pin; fresh ones survive") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "stale", Seq((9L, 9L)).toDF("k", "v"))
    Thread.sleep(30)
    cat.appendToBranch("t", "fresh", Seq((8L, 8L)).toDF("k", "v"))
    val dropped = cat.expireBranches("t", graceMs = 25L)
    assert(dropped.map(_._1) === Seq("stale"))
    assert(cat.branches("t").keySet === Set("fresh"))
    assert(cat.readBranch("t", "fresh").count() === 4L)
    // grace 0 with no branches older than "now": everything goes
    Thread.sleep(5)
    assert(cat.expireBranches("t", graceMs = 0L).map(_._1) === Seq("fresh"))
    assert(cat.branches("t").isEmpty)
  }

  test("vacuum sweeps orphaned branch data but never an open branch") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "open", Seq((9L, 9L)).toDF("k", "v"))
    // simulate a dropBranch that crashed between its two deletes:
    // pointer gone, data dir left behind
    cat.appendToBranch("t", "crashed", Seq((8L, 8L)).toDF("k", "v"))
    Files.delete(Paths.get(cat.path("t"), "_branch_crashed"))
    val audit = cat.vacuum("t", graceMs = 0L).map(x => x._1 -> x._2).toMap
    assert(audit.contains("branch_orphan"), s"audit: $audit")
    assert(!Files.exists(Paths.get(cat.path("t"), "_branchdata_crashed")))
    // the open branch survived, data intact, still publishable
    assert(Files.exists(Paths.get(cat.path("t"), "_branchdata_open")))
    cat.publishBranch("t", "open")
    assert(cat.read("t").count() === 4L)
  }
}
