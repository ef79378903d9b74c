package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** The staged-append protocol: appendAtomic's data write runs with NO
  * lock held; the lock covers only revalidation + a file MOVE. The
  * `afterStage` hook is the deterministic race window (the
  * stagedRewrite build-callback pattern) — whatever commits inside it
  * is exactly "a writer landing while this append's data write was in
  * flight", which under the pre-staging design could not happen (the
  * append held the lease for its whole write). */
class AppendStagingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("apst-cat").toString)

  private def noResidue(cat: TableCatalog, t: String): Unit = {
    val s = Files.list(Paths.get(cat.path(t)))
    try {
      import scala.jdk.CollectionConverters._
      assert(!s.iterator().asScala
        .exists(_.getFileName.toString.startsWith("_tmp_txn-")),
        "staging residue survived the commit")
    } finally s.close()
  }

  test("a concurrent append mid-stage does NOT invalidate the staging; both land") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    val v = cat.appendAtomicStaged("t",
      Seq((2000L, 2000L)).toDF("k", "v"), mergeSchema = false, () => {
        // the racer: a plain append committing inside the stage window
        cat.appendAtomic("t", Seq((1000L, 1000L)).toDF("k", "v"))
      })
    // the racer took v2, the staged append landed on top as v3 — no
    // rework (same ids, same constraints ⇒ the staged bytes are valid
    // against ANY newer version of the same schema)
    assert(v === 3L)
    assert(cat.read("t").count() === 102L)
    assert(cat.read("t").filter(col("k") >= 1000L).count() === 2L)
    noResidue(cat, "t")
  }

  test("a rename mid-stage voids the staging: the retry re-stages under the new name") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 10).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    // one-shot hook: the retry re-opens the race window, and a second
    // rename of an already-renamed column would (rightly) refuse
    var windows = 0
    val v = cat.appendAtomicStaged("t",
      Seq((100L, 100L)).toDF("k", "v2"), mergeSchema = false, () => {
        windows += 1
        if (windows == 1) cat.renameColumn("t", "v", "v2")
      })
    // the window opened TWICE: the voided staging was retried unlocked,
    // not degraded to an inline write under the lease
    assert(windows === 2)
    assert(v === 3L)
    // the appended row reads under the renamed column alongside the
    // id-rebound old files — nothing null-filled, nothing lost
    assert(cat.read("t").columns.toSeq === Seq("k", "v2"))
    assert(cat.read("t").count() === 11L)
    assert(cat.read("t").filter(col("v2").isNull).count() === 0L)
    noResidue(cat, "t")
  }

  test("a constraint added mid-stage judges the staged rows: violating append refuses") {
    val cat = freshCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    var fired = false
    val e = intercept[Exception] {
      cat.appendAtomicStaged("t",
        Seq((-1L, -1L)).toDF("k", "v"), mergeSchema = false, () => {
          if (!fired) { fired = true; cat.addConstraint("t", "k_pos", "k > 0") }
        })
    }
    assert(e.getMessage.contains("k_pos"))
    // the refused append left neither data nor staging behind
    assert(cat.read("t").count() === 5L)
    noResidue(cat, "t")
  }

  test("a full rewrite mid-stage: the append lands on the NEW snapshot, never the old") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 10).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    // same column names survive the rewrite, so ids stay stable: the
    // staged bytes remain valid and must stack on the rewrite's files
    val v = cat.appendAtomicStaged("t",
      Seq((100L, 100L)).toDF("k", "v"), mergeSchema = false, () => {
        cat.replaceAtomic("t", (0 until 10).map(i => (i.toLong + 50L, i.toLong))
          .toDF("k", "v"))
      })
    assert(cat.read("t").count() === 11L)
    assert(cat.read("t").filter(col("k") === 100L).count() === 1L)
    // the rewrite's content (k shifted by 50) is what the append joined
    assert(cat.read("t").filter(col("k") < 50L).count() === 0L)
    assert(v === cat.currentVersion("t").get)
    noResidue(cat, "t")
  }

  test("flat appends carry via the snapshot MANIFEST: the previous " +
      "snapshot is never re-walked; a pre-manifest snapshot pays one " +
      "walk that mints it; content identical through every mode") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mfflat").toString)
    cat.replaceAtomic("t", (1 to 10).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    val walks0 = TableCatalog.carryWalks.get()
    cat.appendAtomic("t", Seq((11L, 11L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((12L, 12L)).toDF("k", "v"))
    cat.mergeInto("t", Seq((12L, 99L)).toDF("k", "v"), Seq("k"))
    cat.appendAtomic("t", Seq((13L, 13L)).toDF("k", "v"))
    assert(TableCatalog.carryWalks.get() === walks0,
      "manifested flat snapshots must never be re-walked by the carry")
    val expect = cat.read("t").orderBy("k").collect().toSeq
    // a LEGACY snapshot (pre-manifest layout): one fallback walk mints
    // the manifest for every later commit
    val v = cat.currentVersion("t").get
    Files.delete(Paths.get(cat.path("t"), s"_v$v", "_leafmanifest.json"))
    cat.appendAtomic("t", Seq((14L, 14L)).toDF("k", "v"))
    assert(TableCatalog.carryWalks.get() === walks0 + 1L)
    cat.appendAtomic("t", Seq((15L, 15L)).toDF("k", "v"))
    assert(TableCatalog.carryWalks.get() === walks0 + 1L,
      "the fallback walk must mint the manifest for later commits")
    assert(cat.read("t").filter(col("k") <= 13L).orderBy("k")
      .collect().toSeq === expect)
    assert(cat.read("t").count() === expect.size + 2L)
    // history file counts agree with what is on disk
    val vh = cat.currentVersion("t").get
    val onDisk = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(Paths.get(cat.path("t"), s"_v$vh"))
      try st.iterator().asScala.count(
        _.getFileName.toString.endsWith(".parquet")).toLong
      finally st.close()
    }
    assert(cat.history("t").filter(col("version") === vh)
      .select("files").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .head() === onDisk)
  }
}
