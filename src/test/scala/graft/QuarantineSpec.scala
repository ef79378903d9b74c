package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** The quarantine fence (r18, VERDICT r17 missing #4): fsck's
  * data-loss findings are diagnose-only by design, but the operator
  * needed a verb that stops writers (and retention sweeps) from
  * churning the sick table while they investigate. `quarantine`
  * fences EVERY mutation — locked verbs through the one check in the
  * lease-lock machinery, the unlocked plain append/overwrite
  * explicitly — while reads, time travel, and fsck keep serving. */
class QuarantineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("quar").toString
    seq += 1
    val name = s"gquar$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("quarantine fences every writer class — versioned commit, " +
      "partitioned insert, plain append/overwrite, branch staging, " +
      "DML, vacuum, drop — each refusal naming the reason; reads, " +
      "time travel, and fsck keep serving") {
    val (cat, g) = freshSqlCat()
    // versioned flat table with history to time-travel into
    cat.replaceAtomic("vt", (1 to 10).map(i => (i.toLong, i)).toDF("k", "v"))
    val v1 = cat.appendAtomic("vt", Seq((11L, 11)).toDF("k", "v"))
    // a branch to prove staging is fenced too (created by the first
    // staged append, before the fence lands)
    cat.appendToBranch("vt", "audit", Seq((99L, 99)).toDF("k", "v"))
    // plain partitioned table for the unlocked-verb fences
    spark.sql(s"CREATE TABLE $g.pl (k BIGINT, dt STRING) PARTITIONED BY (dt)")
    cat.insertPartitioned("pl", Seq((1L, "2024-01-01")).toDF("k", "dt"))
    // plain FLAT table for append/overwrite (the two unlocked verbs)
    cat.overwrite("fl", Seq((1L, 1)).toDF("k", "v"))

    cat.quarantine("vt", "manifest hole under investigation")
    cat.quarantine("pl", "suspect leaf sizes")
    cat.quarantine("fl", "suspect leaf sizes")

    def refused(body: => Any): String = {
      val e = intercept[IllegalStateException](body)
      assert(e.getMessage.contains("QUARANTINED"), e.getMessage)
      assert(e.getMessage.contains("unquarantine"), e.getMessage)
      e.getMessage
    }
    assert(refused(cat.appendAtomic("vt", Seq((12L, 12)).toDF("k", "v")))
      .contains("manifest hole under investigation"))
    refused(cat.replaceAtomic("vt", Seq((0L, 0)).toDF("k", "v")))
    refused(cat.appendToBranch("vt", "audit", Seq((13L, 13)).toDF("k", "v")))
    refused(cat.publishBranch("vt", "audit"))
    refused(cat.vacuum("vt"))
    refused(cat.tag("vt", "pin"))
    refused(cat.dropTable("vt"))
    refused(cat.insertPartitioned("pl", Seq((2L, "2024-01-02")).toDF("k", "dt")))
    refused(spark.sql(s"INSERT INTO $g.pl VALUES (3, '2024-01-03')"))
    refused(spark.sql(s"DELETE FROM $g.pl WHERE dt = '2024-01-01'"))
    refused(cat.append("fl", Seq((2L, 2)).toDF("k", "v")))
    refused(cat.overwrite("fl", Seq((3L, 3)).toDF("k", "v")))
    // reads are NEVER fenced
    assert(cat.read("vt").count() === 11L)
    assert(cat.readVersion("vt", v1 - 1).count() === 10L)
    assert(cat.read("pl").count() === 1L)
    assert(spark.sql(s"SELECT * FROM $g.pl").count() === 1L)
    // fsck reports the fence, loudly, and stays read-only
    val f = cat.fsck("vt")
    assert(f.exists(x => x._1 == "warn" && x._2 == "quarantined" &&
      x._3.contains("manifest hole under investigation")), f.toString)

    // unquarantine lifts: the exact writes that refused now land
    assert(cat.unquarantine("vt"))
    assert(cat.unquarantine("pl"))
    assert(cat.unquarantine("fl"))
    assert(!cat.unquarantine("fl")) // idempotent, reports prior state
    cat.appendAtomic("vt", Seq((12L, 12)).toDF("k", "v"))
    cat.insertPartitioned("pl", Seq((2L, "2024-01-02")).toDF("k", "dt"))
    cat.append("fl", Seq((2L, 2)).toDF("k", "v"))
    assert(cat.read("vt").count() === 12L)
    assert(cat.read("pl").count() === 2L)
    assert(cat.read("fl").count() === 2L)
    assert(cat.fsck("vt").forall(_._2 != "quarantined"))
  }

  test("fsck advises the fence on data-loss findings and skips repair " +
      "while quarantined; the SQL procedures round-trip") {
    val (cat, g) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    val v = cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    // inject a manifest hole — a data-loss finding
    val leaf = Paths.get(cat.path("pv"), s"_v$v", "dt=2024-01-01")
    import scala.jdk.CollectionConverters._
    val s = Files.list(leaf)
    val part = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally s.close()
    Files.delete(part)
    val f1 = cat.fsck("pv")
    assert(f1.exists(_._2 == "manifest_file_missing"), f1.toString)
    assert(f1.exists(x => x._1 == "advice" && x._2 == "quarantine_advised"),
      f1.toString)
    // take the advice, via SQL
    val q = spark.sql(
      s"CALL $g.system.quarantine('pv', 'hole in _v$v')").collect()
    assert(q.head.getAs[String]("reason") === s"hole in _v$v")
    // quarantined: the advice row retires, the fence row appears, and
    // repair goes diagnose-only (healing verbs are writers too)
    val f2 = cat.fsck("pv", repair = true)
    assert(f2.exists(_._2 == "quarantined"), f2.toString)
    assert(!f2.exists(_._2 == "quarantine_advised"), f2.toString)
    assert(f2.exists(x => x._2 == "repair_skipped" &&
      x._3.contains("quarantined")), f2.toString)
    // SQL fsck serves while fenced (read-only)
    assert(spark.sql(s"CALL $g.system.fsck('pv')").collect()
      .exists(_.getAs[String]("check") == "quarantined"))
    // lift via SQL; repair heals again
    assert(spark.sql(s"CALL $g.system.unquarantine('pv')")
      .head().getAs[Boolean]("was_quarantined"))
    val f3 = cat.fsck("pv", repair = true)
    assert(!f3.exists(_._2 == "quarantined"), f3.toString)
    assert(!f3.exists(x => x._2 == "repair_skipped" &&
      x._3.contains("quarantined")), f3.toString)
  }

  test("fsck_all(repair) with ONE quarantined table in the catalog: " +
      "the fleet pass heals the healthy table, reports the fence and " +
      "skips repair on the fenced one, and never stalls") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("sick", Seq((1L, 1)).toDF("k", "v"))
    cat.replaceAtomic("fine", Seq((2L, 2)).toDF("k", "v"))
    // healable residue on BOTH: a dead-branch publish intent
    Seq("sick", "fine").foreach { t =>
      Files.write(Paths.get(cat.path(t), "_brpend_ghost"),
        "{}".getBytes("UTF-8"))
    }
    cat.quarantine("sick", "under investigation")
    val rows = cat.fsckAll(repair = true, graceMs = 0L)
    assert(rows.exists(r => r._1 == "sick" && r._3 == "quarantined"),
      rows.toString)
    assert(rows.exists(r => r._1 == "sick" && r._3 == "repair_skipped" &&
      r._4.contains("quarantined")), rows.toString)
    // the healthy table healed: its intent folded during THIS pass
    assert(!Files.exists(Paths.get(cat.path("fine"), "_brpend_ghost")))
    // the fenced table's residue is untouched (healing is a writer)
    assert(Files.exists(Paths.get(cat.path("sick"), "_brpend_ghost")))
    // lift, re-run: the fleet pass converges
    assert(cat.unquarantine("sick"))
    cat.fsckAll(repair = true, graceMs = 0L)
    assert(!Files.exists(Paths.get(cat.path("sick"), "_brpend_ghost")))
    assert(spark.sql(s"CALL $g.system.fsck_all()").count() === 0L)
  }

  test("quarantine waits for an in-flight writer's lease rather than " +
      "bisecting its commit, and re-quarantine updates the reason") {
    val (cat, _) = freshSqlCat()
    cat.replaceAtomic("t", Seq((1L, 1)).toDF("k", "v"))
    // hold the writer lock on another thread; quarantine must block
    // until release, then land
    val locked = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      cat.withTableLock("t") { locked.countDown(); release.await() }
    })
    writer.start()
    locked.await()
    val qDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val quar = new Thread(() => {
      cat.quarantine("t", "first reason"); qDone.set(true)
    })
    quar.start()
    Thread.sleep(300)
    assert(!qDone.get(), "quarantine must wait for the live writer lease")
    release.countDown(); writer.join(); quar.join()
    assert(qDone.get())
    assert(cat.quarantineInfo("t").exists(_._2 == "first reason"))
    cat.quarantine("t", "second reason") // idempotent update
    assert(cat.quarantineInfo("t").exists(_._2 == "second reason"))
    assert(cat.unquarantine("t"))
    cat.appendAtomic("t", Seq((2L, 2)).toDF("k", "v"))
    assert(cat.read("t").count() === 2L)
  }
}
