package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

/** The whole staged-commit protocol under REAL thread interleaving —
  * not the deterministic afterStage windows the per-verb specs drive,
  * but N writers, a compactor, and a branch publisher hammering ONE
  * table concurrently. The invariant is exact: every committed row
  * survives (no lost update), nothing duplicates (no double-land),
  * and the table carries no staging residue afterwards. This is the
  * local[32] stand-in for "1000 executors' drivers share a table":
  * correctness must come from the commit protocol, never from timing. */
class ConcurrentWritersSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("concurrent staged appends + compaction + branch publish: exact union, no residue") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("cw-cat").toString)
    cat.replaceAtomic("t",
      Seq((-1L, -1L, -1L)).toDF("writer", "seq", "v"))

    val writers = 4
    val appendsEach = 4
    val rowsEach = 10
    val errs = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Unit =
      try body catch { case t: Throwable => errs.compareAndSet(null, t) }

    val appendThreads = (0 until writers).map { w =>
      new Thread(() => guard {
        (0 until appendsEach).foreach { s =>
          val rows = (0 until rowsEach)
            .map(i => (w.toLong, s.toLong, i.toLong))
          cat.appendAtomic("t", rows.toDF("writer", "seq", "v"))
        }
      }, s"writer-$w")
    }
    val compactor = new Thread(() => guard {
      (0 until 2).foreach { _ =>
        Thread.sleep(300)
        cat.compactSmallFiles("t", targetBytes = 256L << 20)
      }
    }, "compactor")
    val brancher = new Thread(() => guard {
      cat.appendToBranch("t", "wap",
        (0 until rowsEach).map(i => (99L, 0L, i.toLong))
          .toDF("writer", "seq", "v"))
      Thread.sleep(200)
      cat.publishBranch("t", "wap")
    }, "brancher")

    val all = appendThreads :+ compactor :+ brancher
    all.foreach(_.start())
    all.foreach(_.join(300000))
    assert(errs.get() === null,
      s"a concurrent writer failed: ${errs.get()}")

    // exact union: the seed row, every (writer, seq, v) appended, the
    // branch rows — each exactly once
    val got = cat.read("t")
    assert(got.count() ===
      1L + writers.toLong * appendsEach * rowsEach + rowsEach)
    assert(got.distinct().count() === got.count(), "a commit double-landed")
    val perWriter = got.filter(col("writer") >= 0 && col("writer") < 99)
      .groupBy("writer").count().as[(Long, Long)].collect().toMap
    assert(perWriter === (0 until writers)
      .map(w => w.toLong -> (appendsEach * rowsEach).toLong).toMap,
      "a writer lost an append")
    assert(got.filter(col("writer") === 99L).count() === rowsEach.toLong)

    // protocol hygiene: no staging residue, no open branch, history
    // monotonic with every commit accounted for
    val s = Files.list(Paths.get(cat.path("t")))
    try {
      import scala.jdk.CollectionConverters._
      val residue = s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("_tmp_txn-") || n.startsWith("_branch"))
        .toList
      assert(residue.isEmpty, s"residue: $residue")
    } finally s.close()
    val hist = cat.history("t").orderBy("version")
      .select("version", "op").as[(Long, String)].collect()
    assert(hist.map(_._1).toSeq === (1L to hist.length.toLong))
    assert(hist.count(_._2 == "PUBLISH") === 1)
    assert(hist.map(_._2).count(Set("APPEND", "REPLACE")) >=
      1 + writers * appendsEach)
  }

  test("branch stagers hammered by a publisher: every staged row lands " +
      "exactly once, whichever publish carries it (ADVICE r11 high)") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("cw-br").toString)
    cat.replaceAtomic("t", Seq((-1L, -1L)).toDF("writer", "v"))

    val stagers = 3
    val batchesEach = 5
    val rowsEach = 8
    val errs = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Unit =
      try body catch { case t: Throwable => errs.compareAndSet(null, t) }

    // each stager's rows are globally unique; a stage whose branch life
    // ends mid-move restages onto the next life (the r12 lock + epoch
    // protocol), so every row must land in SOME publish — exactly once
    val stageThreads = (0 until stagers).map { w =>
      new Thread(() => guard {
        (0 until batchesEach).foreach { b =>
          val rows = (0 until rowsEach)
            .map(i => (w.toLong, (b * rowsEach + i).toLong))
          cat.appendToBranch("t", "wap", rows.toDF("writer", "v"))
        }
      }, s"stager-$w")
    }
    val publisher = new Thread(() => guard {
      (0 until 6).foreach { _ =>
        Thread.sleep(120)
        // a publish between two stages may find the branch absent
        // (the previous publish consumed it and nothing restaged yet)
        try cat.publishBranch("t", "wap")
        catch { case e: IllegalArgumentException
          if String.valueOf(e.getMessage).contains("no branch") => () }
      }
    }, "publisher")

    val all = stageThreads :+ publisher
    all.foreach(_.start())
    all.foreach(_.join(300000))
    assert(errs.get() === null, s"a concurrent actor failed: ${errs.get()}")
    // final publish drains whatever the last stages left behind
    if (cat.branches("t").contains("wap")) cat.publishBranch("t", "wap")

    val got = cat.read("t")
    assert(got.count() === 1L + stagers.toLong * batchesEach * rowsEach,
      "a staged row was lost or doubled across racing publishes")
    assert(got.distinct().count() === got.count(), "a stage double-landed")
    val perWriter = got.filter(col("writer") >= 0)
      .groupBy("writer").count().as[(Long, Long)].collect().toMap
    assert(perWriter === (0 until stagers)
      .map(w => w.toLong -> (batchesEach * rowsEach).toLong).toMap)
    // hygiene: branch fully consumed, no dead-life dirs left unswept
    assert(cat.branches("t").isEmpty)
    val s = Files.list(Paths.get(cat.path("t")))
    try {
      import scala.jdk.CollectionConverters._
      val dirs = s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("_branchdata_")).toList
      assert(dirs.isEmpty, s"dead branch-life dirs: $dirs")
    } finally s.close()
  }

  test("concurrent pv appenders + branch stagers + a publisher on ONE " +
      "partitioned versioned fact: exact union, monotonic snapshots, " +
      "manifest always agrees with the tree") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("cw-pv").toString)
    cat.createPartitionedVersioned("f",
      Seq((0L, 0L, "x")).toDF("writer", "v", "dt").schema, Seq("dt"))
    val writers = 3
    val appendsEach = 4
    val errs = new AtomicReference[Throwable](null)
    def guard(body: => Unit): Unit =
      try body catch { case t: Throwable => errs.compareAndSet(null, t) }
    // direct pv appenders (optimistic stage + locked snapshot commit)
    val appenders = (0 until writers).map { w =>
      new Thread(() => guard {
        (0 until appendsEach).foreach { b =>
          cat.appendPartitionedVersioned("f",
            Seq((w.toLong, b.toLong, s"2024-01-0${(b % 3) + 1}"))
              .toDF("writer", "v", "dt"))
        }
      }, s"pv-appender-$w")
    }
    // a branch stager + publisher racing the appenders
    val stager = new Thread(() => guard {
      (0 until 4).foreach { b =>
        cat.appendToBranch("f", "wap",
          Seq((100L, b.toLong, "2024-02-01")).toDF("writer", "v", "dt"))
      }
    }, "pv-stager")
    val publisher = new Thread(() => guard {
      (0 until 4).foreach { _ =>
        Thread.sleep(150)
        try cat.publishBranch("f", "wap")
        catch { case e: IllegalArgumentException
          if String.valueOf(e.getMessage).contains("no branch") => () }
      }
    }, "pv-publisher")
    val all = appenders ++ Seq(stager, publisher)
    all.foreach(_.start())
    all.foreach(_.join(300000))
    assert(errs.get() === null, s"a concurrent actor failed: ${errs.get()}")
    if (cat.branches("f").contains("wap")) cat.publishBranch("f", "wap")
    val got = cat.read("f")
    assert(got.count() === (writers * appendsEach + 4).toLong,
      "a pv append or staged row was lost or doubled")
    assert(got.distinct().count() === got.count())
    // the head snapshot's manifest agrees exactly with its tree
    val v = cat.currentVersion("f").get
    val snap = Paths.get(cat.path("f"), s"_v$v")
    val onDisk = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(snap)
      try st.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
        .map(p => snap.relativize(p).toString).toSet
      finally st.close()
    }
    val manifest = new String(Files.readAllBytes(
      snap.resolve("_leafmanifest.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    onDisk.foreach(rel => assert(manifest.contains(rel),
      s"manifest missing $rel"))
  }
}
