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

  private def branchDirs(cat: TableCatalog, table: String,
                         name: String): Seq[String] = {
    val s = Files.list(Paths.get(cat.path(table)))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(s"_branchdata_$name")).toSeq
    } finally s.close()
  }

  test("expire firing inside a staged batch's window: rows restage onto " +
      "the next life, never orphan (r11 verdict wrong #1)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    // seed the branch so the expiring sweep has a pointer to kill
    cat.appendToBranch("t", "wap", Seq((10L, 10L)).toDF("k", "v"))
    var fired = false
    cat.appendToBranchBatchStaged("t", "wap", 7L,
      Seq((20L, 20L), (21L, 21L)).toDF("k", "v"), token = "tok",
      mergeSchema = false, afterStage = () => {
        if (!fired) { fired = true
          assert(cat.expireBranches("t", graceMs = 0L).map(_._1) === Seq("wap"))
        }
      })
    assert(fired)
    // the batch's rows landed on the branch's NEW life (the seed row
    // died with the expire — that is what expiry means); no dead-life
    // dir was adopted
    assert(cat.readBranch("t", "wap").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L, 20L, 21L))
    assert(branchDirs(cat, "t", "wap").size === 1)
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 5L)
  }

  test("publish racing a staged batch cannot silently lose its rows " +
      "(ADVICE r11 high)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((10L, 10L)).toDF("k", "v"))
    var fired = false
    cat.appendToBranchBatchStaged("t", "wap", 3L,
      Seq((30L, 30L)).toDF("k", "v"), token = "tok",
      mergeSchema = false, afterStage = () => {
        if (!fired) { fired = true
          // the operator publishes between this batch's data write and
          // its move — the old code's deleteRecursive would eat the
          // batch's files the instant they moved in
          cat.publishBranch("t", "wap")
        }
      })
    assert(fired)
    assert(cat.read("t").count() === 4L) // seed row published
    // the racing batch's row is STAGED on the re-created branch
    assert(cat.readBranch("t", "wap").filter(col("k") === 30L).count() === 1L)
    cat.publishBranch("t", "wap")
    assert(cat.read("t").filter(col("k") === 30L).count() === 1L)
    assert(cat.read("t").count() === 5L)
  }

  test("a staged batch that published before its marker is skipped on " +
      "replay via the publish high-water mark (ADVICE r11 medium)") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((0L, 0L)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 5L, Seq((1L, 1L)).toDF("k", "v"),
      token = "incarnation1")
    // crash before the marker, then the operator publishes
    cat.publishBranch("t", "wap")
    assert(cat.publishedBranchBatch("t", "wap", "incarnation1") === Some(5L))
    // a NEW incarnation's ids never collide with the old high-water
    assert(cat.publishedBranchBatch("t", "wap", "incarnation2") === None)
    // the replayed batch (same token, id <= high-water) must be SKIPPED
    // by the ingest loop; restaging it would double the rows at the
    // next publish — pin the double to prove the mark is load-bearing
    if (cat.publishedBranchBatch("t", "wap", "incarnation1").forall(_ < 5L))
      fail("high-water mark must cover the published batch")
    assert(cat.read("t").count() === 2L)
  }

  test("mergeBranchInto repairs a failing audit on the branch; publish " +
      "lands the fix as one REPLACE (r11 verdict #2)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.addConstraint("t", "v_small", "v < 100")
    // remove the constraint briefly to stage a bad row (simulating a
    // constraint added after the stage — the audit-catches-it shape)
    cat.dropConstraint("t", "v_small")
    cat.appendToBranch("t", "wap", Seq((10L, 500L), (11L, 11L)).toDF("k", "v"))
    cat.addConstraint("t", "v_small", "v < 100")
    val bad = intercept[Exception] { cat.auditBranch("t", "wap") }
    assert(bad.getMessage.contains("v_small"))
    // the FIX: merge the corrected row into the branch, main untouched
    val (upd, del, ins, kept) = cat.mergeBranchInto("t", "wap",
      Seq((10L, 99L)).toDF("k", "v"), Seq("k"))
    assert((upd, del, ins, kept) === (1L, 0L, 0L, 6L))
    assert(cat.read("t").count() === 5L)
    assert(cat.auditBranch("t", "wap") === 7L) // audit passes now
    val v = cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 7L)
    assert(cat.read("t").filter(col("k") === 10L).select(col("v"))
      .head().getLong(0) === 99L)
    assert(cat.history("t").filter(col("op") === "PUBLISH")
      .filter(col("version") === v).count() === 1L)
    assert(cat.branches("t").isEmpty)
  }

  test("a REPLACE-mode branch refuses to rebase: publish after the head " +
      "moved fails loudly; append mode still rebases") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 4).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "fix", Seq((9L, 9L)).toDF("k", "v"))
    cat.mergeBranchInto("t", "fix", Seq((1L, 100L)).toDF("k", "v"), Seq("k"))
    cat.appendAtomic("t", Seq((50L, 50L)).toDF("k", "v")) // head moves
    val e = intercept[Exception] { cat.publishBranch("t", "fix") }
    assert(e.getMessage.contains("cannot rebase"))
    cat.dropBranch("t", "fix")
    assert(cat.read("t").count() === 5L)
  }

  test("deleteFromBranch drops junk rows from the would-be state; NULL " +
      "predicates keep their rows (3VL)") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, Some(1L)), (2L, None), (3L, Some(3L)))
      .toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((10L, Some(99L))).toDF("k", "v"))
    // v > 50 matches only the staged junk row; the NULL-v row SURVIVES
    val deleted = cat.deleteFromBranch("t", "wap", col("v") > 50L)
    assert(deleted === 1L)
    assert(cat.readBranch("t", "wap").count() === 3L)
    assert(cat.read("t").count() === 3L) // main untouched
    cat.publishBranch("t", "wap")
    assert(cat.read("t").orderBy("k").select("k").as[Long].collect().toSeq
      === Seq(1L, 2L, 3L))
  }

  test("replaceBranch stages a full rewrite; audit sees EXACTLY it; " +
      "publish commits it as the table") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 6).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.replaceBranch("t", "rw", cat.read("t").filter(col("k") <= 2L))
    assert(cat.read("t").count() === 6L) // main untouched
    assert(cat.readBranch("t", "rw").count() === 2L) // would-be state
    cat.publishBranch("t", "rw")
    assert(cat.read("t").count() === 2L)
    assert(cat.branches("t").isEmpty)
    // time travel still reaches the pre-publish snapshot
    assert(cat.readVersion("t", 1L).count() === 6L)
  }

  test("publish crash windows are idempotent: a pre-commit crash loses " +
      "nothing (links, not moves); a post-commit crash never " +
      "double-publishes (write-ahead intent)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 4L,
      Seq((10L, 10L), (11L, 11L)).toDF("k", "v"), token = "tok")
    // crash AFTER the write-ahead intent, BEFORE the commit: under the
    // old move-based layout this window silently VANISHED the staged
    // rows (drained dir, no commit); links keep the branch whole
    val e1 = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ())
    }
    assert(e1.getMessage === "crash-pre-commit")
    assert(cat.read("t").count() === 3L) // nothing landed on main
    assert(cat.readBranch("t", "wap").count() === 5L) // nothing lost
    cat.publishBranch("t", "wap") // the retry lands exactly once
    assert(cat.read("t").count() === 5L)
    assert(cat.branches("t").isEmpty)
    // crash AFTER the commit, BEFORE record/consume: the retry must
    // recover (consume + fold the watermark), never re-publish the
    // same files onto the new head
    cat.appendToBranchBatch("t", "wap", 7L,
      Seq((20L, 20L)).toDF("k", "v"), token = "tok")
    val e2 = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit"))
    }
    assert(e2.getMessage === "crash-post-commit")
    assert(cat.read("t").count() === 6L) // the commit DID land
    assert(cat.branches("t").keySet === Set("wap")) // consume never ran
    cat.publishBranch("t", "wap") // recovery: consume, not re-publish
    assert(cat.read("t").count() === 6L)
    assert(cat.read("t").distinct().count() === 6L, "a recovery re-published")
    assert(cat.branches("t").isEmpty)
    // the crashed publish's watermark was recovered: batch 7 skips on
    // replay even though its marker never landed
    assert(cat.publishedBranchBatch("t", "wap", "tok") === Some(7L))
  }

  test("a batch replayed into the commit→record crash window is swept " +
      "by recovery — never published twice — while a genuinely new " +
      "post-crash batch survives and lands once") {
    val cat = freshCat()
    cat.replaceAtomic("t",
      (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 4L,
      Seq((10L, 10L), (11L, 11L)).toDF("k", "v"), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit"))
    }
    assert(e.getMessage === "crash-post-commit")
    assert(cat.read("t").count() === 5L) // the commit DID land
    // the watermark never recorded, so a restarted stream's skip rule
    // sees nothing and RE-STAGES batch 4 under fresh UUIDs (ADVICE r13
    // medium #3) — and a genuinely new batch 5 stages after it
    assert(cat.publishedBranchBatch("t", "wap", "tok") === None)
    cat.appendToBranchBatch("t", "wap", 4L,
      Seq((10L, 10L), (11L, 11L)).toDF("k", "v"), token = "tok")
    cat.appendToBranchBatch("t", "wap", 5L,
      Seq((12L, 12L)).toDF("k", "v"), token = "tok")
    // recovery must sweep the REPLAYED batch's data files (their
    // batchId is covered by the folded watermark) and keep batch 5
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 6L,
      "the replayed batch double-published or batch 5 was lost")
    assert(cat.read("t").distinct().count() === 6L)
    assert(cat.publishedBranchBatch("t", "wap", "tok") === Some(5L))
    assert(cat.branches("t").isEmpty)
  }

  test("a legacy publish intent (no provenance UUID) whose target " +
      "version exists refuses loudly instead of guessing") {
    val cat = freshCat()
    cat.replaceAtomic("t",
      (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v")) // v1
    cat.appendToBranchBatch("t", "wap", 1L,
      Seq((10L, 10L)).toDF("k", "v"), token = "tok")
    // forge a pre-r13 intent: no pub field, expect = an existing
    // version — version arithmetic alone cannot tell "ours" from a
    // foreign commit, so recovery must refuse, not re-publish
    Files.write(Paths.get(cat.path("t"), "_brpend_wap"),
      """{"expect":1,"epoch":"x","tokens":{"tok":1}}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      cat.publishBranch("t", "wap")
    }
    assert(e.getMessage.contains("legacy publish intent"), e.getMessage)
    // expect ABOVE the current version is provably pre-commit: the
    // intent drops and the publish proceeds normally
    Files.write(Paths.get(cat.path("t"), "_brpend_wap"),
      """{"expect":99,"epoch":"x","tokens":{"tok":1}}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 4L)
  }

  test("diffBranch answers 'what would this publish change' for both modes") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 4).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((10L, 10L), (11L, 11L)).toDF("k", "v"))
    // append mode: additions only, base never part of the answer
    val d1 = cat.diffBranch("t", "wap")
    assert(d1.filter(col("change_type") === "add").count() === 2L)
    assert(d1.filter(col("change_type") === "remove").count() === 0L)
    // a merge-fix flips to replace mode: the diff shows the update as
    // remove(old) + add(new), plus the staged additions
    cat.mergeBranchInto("t", "wap", Seq((1L, 100L)).toDF("k", "v"), Seq("k"))
    val d2 = cat.diffBranch("t", "wap").collect()
      .map(r => (r.getString(2), r.getLong(0), r.getLong(1))).toSet
    assert(d2 === Set(("add", 10L, 10L), ("add", 11L, 11L),
      ("add", 1L, 100L), ("remove", 1L, 1L)))
    // the diff is exactly what publish then does
    cat.publishBranch("t", "wap")
    assert(cat.read("t").filter(col("k") === 1L).select("v")
      .as[Long].head() === 100L)
    assert(cat.read("t").count() === 6L)
  }

  test("branch schema evolves additively under mergeSchema; old staged " +
      "files and the base null-fill; publish lands the union (r11 #6)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((10L, 10L)).toDF("k", "v"))
    // un-evolved writes still refuse loudly
    val e = intercept[Exception] {
      cat.appendToBranch("t", "wap", Seq((11L, 11L, "x")).toDF("k", "v", "s"))
    }
    assert(e.getMessage.contains("mergeSchema"))
    cat.appendToBranch("t", "wap", Seq((11L, 11L, "x")).toDF("k", "v", "s"),
      mergeSchema = true)
    val audit = cat.readBranch("t", "wap")
    assert(audit.columns.toSeq === Seq("k", "v", "s"))
    assert(audit.filter(col("s").isNull).count() === 4L) // base + first stage
    assert(audit.filter(col("s") === "x").count() === 1L)
    // a type conflict is never mergeable
    val e2 = intercept[Exception] {
      cat.appendToBranch("t", "wap", Seq((12L, "bad")).toDF("k", "v"),
        mergeSchema = true)
    }
    assert(e2.getMessage.contains("type conflict"))
    cat.publishBranch("t", "wap")
    assert(cat.read("t").columns.toSeq === Seq("k", "v", "s"))
    assert(cat.read("t").count() === 5L)
    assert(cat.read("t").filter(col("s") === "x").count() === 1L)
  }

  test("vacuum sweeps orphaned branch data but never an open branch") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranch("t", "open", Seq((9L, 9L)).toDF("k", "v"))
    // simulate a dropBranch that crashed between its two deletes:
    // pointer gone, data dir (epoch-scoped) left behind
    cat.appendToBranch("t", "crashed", Seq((8L, 8L)).toDF("k", "v"))
    Files.delete(Paths.get(cat.path("t"), "_branch_crashed"))
    val audit = cat.vacuum("t", graceMs = 0L).map(x => x._1 -> x._2).toMap
    assert(audit.contains("branch_orphan"), s"audit: $audit")
    assert(branchDirs(cat, "t", "crashed").isEmpty)
    // the open branch survived, data intact, still publishable
    assert(branchDirs(cat, "t", "open").nonEmpty)
    cat.publishBranch("t", "open")
    assert(cat.read("t").count() === 4L)
  }

  test("a foreign commit in the pre-commit crash window never spoofs " +
      "'committed': recovery is provenance-checked, the retry publishes " +
      "for real and folds no phantom watermark (r12 verdict #1)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 4L,
      Seq((10L, 10L), (11L, 11L)).toDF("k", "v"), token = "tok")
    // crash AFTER the intent, BEFORE the commit — then the writer
    // lease expires and an UNRELATED append takes version `expect`.
    // Under bare version arithmetic the intent would read "committed"
    // and the retry would consume the branch without publishing.
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ())
    }
    assert(e.getMessage === "crash-pre-commit")
    cat.appendAtomic("t", Seq((99L, 99L)).toDF("k", "v")) // the foreign commit
    assert(cat.read("t").count() === 4L) // staged rows still not on main
    cat.publishBranch("t", "wap") // provenance says pre-commit: publish
    assert(cat.read("t").count() === 6L)
    assert(cat.read("t").distinct().count() === 6L, "rows doubled")
    assert(cat.read("t").filter(col("k") === 10L).count() === 1L)
    assert(cat.branches("t").isEmpty)
    // the watermark reflects the REAL publish, not the spoofed fold
    assert(cat.publishedBranchBatch("t", "wap", "tok") === Some(4L))
  }

  test("dropBranch with a spoofed intent folds NO phantom watermark " +
      "(the batches never published; replay is their only way back)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 9L,
      Seq((10L, 10L)).toDF("k", "v"), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ())
    }
    assert(e.getMessage === "crash-pre-commit")
    cat.appendAtomic("t", Seq((99L, 99L)).toDF("k", "v")) // steals `expect`
    cat.dropBranch("t", "wap")
    // folding 9 here would make a replayed batch 9 SKIP staging in the
    // branch's next life — permanent loss of rows that never landed
    assert(cat.publishedBranchBatch("t", "wap", "tok") === None)
    assert(cat.branches("t").isEmpty)
  }

  test("a stage landing in the commit-to-consume crash window survives " +
      "recovery: selective consume deletes only the committed files and " +
      "the retry publishes the newcomer (ADVICE r12 high)") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 3).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.appendToBranchBatch("t", "wap", 4L,
      Seq((10L, 10L), (11L, 11L)).toDF("k", "v"), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("t", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit"))
    }
    assert(e.getMessage === "crash-post-commit")
    assert(cat.read("t").count() === 5L) // batch 4 DID commit
    // a racing stager lands batch 5 into the still-live life before
    // anyone runs recovery — its rows must not be collateral damage
    cat.appendToBranchBatch("t", "wap", 5L,
      Seq((20L, 20L)).toDF("k", "v"), token = "tok")
    cat.publishBranch("t", "wap")
    assert(cat.read("t").count() === 6L)
    assert(cat.read("t").distinct().count() === 6L, "recovery re-published")
    assert(cat.read("t").filter(col("k") === 20L).count() === 1L,
      "the post-crash stage was consumed unpublished")
    assert(cat.branches("t").isEmpty)
    assert(cat.publishedBranchBatch("t", "wap", "tok") === Some(5L))
  }

  test("_branchpub_ stays bounded: past MaxPubTokens the least-recently-" +
      "published token retires; every kept token still skips (r12 #5)") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 1L)).toDF("k", "v"))
    val n = TableCatalog.MaxPubTokens + 8
    for (i <- 1 to n) {
      cat.appendToBranchBatch("t", "wap", i.toLong,
        Seq((100L + i, 100L + i)).toDF("k", "v"), token = s"tok$i")
      cat.publishBranch("t", "wap")
    }
    // the newest MaxPubTokens tokens survive and still skip
    assert(cat.publishedBranchBatch("t", "wap", s"tok$n") === Some(n.toLong))
    assert(cat.publishedBranchBatch("t", "wap",
      s"tok${n - TableCatalog.MaxPubTokens + 1}") ===
      Some((n - TableCatalog.MaxPubTokens + 1).toLong))
    // the oldest retired; the file is bounded at MaxPubTokens entries
    assert(cat.publishedBranchBatch("t", "wap", "tok1") === None)
    val pubFile = Paths.get(cat.path("t"), "_branchpub_wap")
    val body = new String(Files.readAllBytes(pubFile), "UTF-8")
    assert("\"tok\\d+\"".r.findAllIn(body).size <= 2 * TableCatalog.MaxPubTokens)
  }
}
