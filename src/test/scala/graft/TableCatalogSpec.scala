package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{Committer, LogCommitter, PosixCommitter, TableCatalog}
import scala.jdk.CollectionConverters._

/** Storage-layout behaviors of the parquet catalog beyond what the
  * golden E2E exercises: bucketed co-located joins. */
class TableCatalogSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("tables bucketed on the join key join without any shuffle or sort") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_cat_").toString)
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L by 2).map(i => (i, s"r$i")).toDF("k", "rv")
    cat.overwriteBucketed("bkt_left", left, "k", 4)
    cat.overwriteBucketed("bkt_right", right, "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joinPlan(): String = {
        val joined = cat.readBucketed("bkt_left")
          .join(cat.readBucketed("bkt_right"), Seq("k"))
        assert(joined.count() === 500)
        joined.queryExecution.executedPlan.toString
      }
      // co-located: the sort-merge join reads the bucketed layout
      // directly — no Exchange (shuffle) on either side
      val plan = joinPlan()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // sort elimination additionally needs the scan to trust the bucket
      // sort order, which Spark ≥3 only does behind the legacy flag AND
      // with one file per bucket — which overwriteBucketed guarantees
      val prevOrdering = spark.conf
        .getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val orderedPlan = joinPlan()
        assert(!orderedPlan.contains("Sort ["),
          s"one-file-per-bucket + legacy scan ordering should not re-sort:\n$orderedPlan")
      } finally prevOrdering match {
        case Some(v) => spark.conf
          .set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => spark.conf
          .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cat.dropBucketed("bkt_left")
      cat.dropBucketed("bkt_right")
    }
  }

  test("the bucket spec survives the session: sidecar re-registration keeps joins shuffle-free") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_bktsc_").toString)
    val left = (1L to 500L).map(i => (i, i * 2)).toDF("k", "lv")
    val right = (1L to 500L by 5).map(i => (i, i * 3)).toDF("k", "rv")
    cat.overwriteBucketed("sl", left, "k", 4)
    cat.overwriteBucketed("sr", right, "k", 4)
    // simulate a fresh JVM: the in-memory session catalog forgets the
    // registration; only the files and the _buckets.json sidecar remain
    cat.dropBucketed("sl"); cat.dropBucketed("sr")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = cat.readBucketed("sl").join(cat.readBucketed("sr"), Seq("k"))
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      // the recovered registration is pure metadata (no re-bucketing)
      // and the co-partitioning guarantee is intact
      assert(!plan.contains("Exchange hashpartitioning"),
        s"re-registered bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      cat.dropBucketed("sl"); cat.dropBucketed("sr")
    }
    // a table never bucketed has no sidecar to recover from — loud
    assertThrows[IllegalArgumentException](cat.readBucketed("nope"))
  }

  test("bucketed names don't cross-wire between catalogs whose roots sanitize identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_coll_")
    // '/w/x' and '/w_x' sanitize to the same token; the raw-root digest
    // must keep their session-catalog entries distinct
    val catA = new TableCatalog(spark, s"$base/w/x")
    val catB = new TableCatalog(spark, s"$base/w_x")
    try {
      catA.overwriteBucketed("t", Seq((1L, "a")).toDF("k", "v"), "k", 2)
      catB.overwriteBucketed("t", Seq((2L, "b")).toDF("k", "v"), "k", 2)
      assert(catA.readBucketed("t").collect().map(_.getLong(0)).toSeq === Seq(1L))
      assert(catB.readBucketed("t").collect().map(_.getLong(0)).toSeq === Seq(2L))
      catB.dropBucketed("t")
      // B's drop must not take A's entry with it
      assert(catA.readBucketed("t").count() === 1)
    } finally { catA.dropBucketed("t"); catB.dropBucketed("t") }
  }

  test("overwriteIndexed + prunedRead: pruned ≡ unpruned; stale manifest refuses") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_skip_").toString)
    val rows = (1L to 4000L).map(i => (i, i % 100, (i * 7) % 1000))
      .toDF("id", "a", "b")
    // sortWithinPartitions after a range repartition → tight per-file
    // envelopes on `a`, so the box probe actually skips files
    cat.overwriteIndexed("tbl",
      rows.repartitionByRange(8, col("a")).sortWithinPartitions("a"), Seq("a", "b"))
    val ranges = Seq(("a", 10L, 20L), ("b", 0L, 500L))
    val pruned = cat.prunedRead("tbl", ranges)
    val unpruned = spark.read.parquet(cat.path("tbl"))
      .filter(col("a").between(10, 20) && col("b").between(0, 500))
    assert(pruned.collect().toSet === unpruned.collect().toSet)
    // the probe must open fewer files than the table holds
    val opened = pruned.select(input_file_name()).distinct().count()
    val total = spark.read.parquet(cat.path("tbl"))
      .select(input_file_name()).distinct().count()
    assert(opened < total, s"no pruning: opened $opened of $total files")

    // mutate the table behind the manifest → read must refuse loudly
    (4001L to 4005L).map(i => (i, i % 100, (i * 7) % 1000)).toDF("id", "a", "b")
      .write.mode("append").parquet(cat.path("tbl"))
    val e = intercept[IllegalArgumentException](cat.prunedRead("tbl", ranges))
    assert(e.getMessage.contains("stale"))
  }

  test("appendIndexed extends the manifest incrementally; prunedRead stays exact") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_skipa_").toString)
    val day1 = (1L to 2000L).map(i => (i, i % 50)).toDF("id", "a")
    cat.overwriteIndexed("tbl", day1.repartitionByRange(4, col("a")), Seq("a"))
    val st1 = cat.stats("tbl").get
    val env1 = cat.fileEnvelopes("tbl")
    assert(st1.skipCols === Seq("a") && env1.nonEmpty,
      "overwriteIndexed must land the file index in the manifest legs")
    assert(st1.rows === 2000L && st1.ndv.contains("a"),
      "the SAME analyze pass must feed join planning (rows/ndv) and pruning")
    // a day-2 append touching a DISJOINT value range: the index grows
    // by only the new files, and pruning still reads exactly right
    val day2 = (2001L to 3000L).map(i => (i, 100 + i % 20)).toDF("id", "a")
    cat.appendIndexed("tbl", day2.repartitionByRange(2, col("a")), Seq("a"))
    val st2 = cat.stats("tbl").get
    val env2 = cat.fileEnvelopes("tbl")
    assert(env2.size > env1.size && env2.size <= env1.size + 2)
    assert(st2.fileCount === env2.size.toLong,
      "the head's fileCount must track the manifest")
    assert(st2.rows === 3000L, "rows stay exact through the incremental append")
    // NDV stays FRESH through the append (the mergeable _ndvsketch
    // sidecar): day-1 has a ∈ 0..49, day-2 adds 100..119 — 70 distinct,
    // exact at HLL's sparse-mode cardinality (overwriteIndexed analyzes
    // cols = skipCols, so "a" is the analyzed set here)
    assert(st2.ndv.get("a") === Some(70L),
      s"merged NDV must cover BOTH days' values: ${st2.ndv}")
    val pruned = cat.prunedRead("tbl", Seq(("a", 100L, 119L)))
    val unpruned = spark.read.parquet(cat.path("tbl"))
      .filter(col("a").between(100, 119))
    assert(pruned.collect().toSet === unpruned.collect().toSet)
    // the day-1 files (a ≤ 49) must not be opened for the day-2 box
    val opened = pruned.select(input_file_name()).distinct().count()
    assert(opened <= 2, s"day-1 files opened: $opened")
    // an EMPTY append (Spark may leave a schema-only part file that no
    // aggregation row describes) must keep the index file-set-fresh —
    // a zero-row file gets an empty-bounds entry, never a stale refusal
    cat.appendIndexed("tbl", day2.limit(0), Seq("a"))
    val pruned2 = cat.prunedRead("tbl", Seq(("a", 100L, 119L)))
    assert(pruned2.collect().toSet === unpruned.collect().toSet)
  }

  // the swap-consistency and lock-race suites run against BOTH committers:
  // the POSIX rename pointer and the append-only commit log must give the
  // same guarantees (the commit layer is the only thing that differs)
  private val committers: Seq[(String, Committer)] =
    Seq("posix" -> PosixCommitter, "log" -> LogCommitter)

  committers.foreach { case (cname, cmtr) =>
  test(s"replaceAtomic[$cname]: a reader concurrent with looping swaps sees exactly " +
      "one committed snapshot, never a mix or a missing table") {
    val root = java.nio.file.Files.createTempDirectory("cat-snap")
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = cmtr)
    def gen(v: Long) = spark.range(200).toDF()
      .select(col("id"), lit(v).as("ver"))
    cat.replaceAtomic("snap_t", gen(0L))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[String](null)
    val writer = new Thread(() => {
      var v = 1L
      while (!stop.get()) { cat.replaceAtomic("snap_t", gen(v)); v += 1 }
    })
    writer.setDaemon(true)
    writer.start()
    try {
      (1 to 25).foreach { _ =>
        // each read must be entirely ONE version: 200 rows, one ver value
        val rows = cat.read("snap_t").select(col("ver")).collect()
        if (rows.length != 200 || rows.map(_.getLong(0)).distinct.length != 1)
          failed.compareAndSet(null,
            s"rows=${rows.length} vers=${rows.map(_.getLong(0)).distinct.toSeq}")
      }
    } finally { stop.set(true); writer.join(30000) }
    assert(failed.get() === null)
    writer.join(30000)
    // the pointer names the newest snapshot on disk
    val vs = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(cat.path("snap_t")))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("_v\\d+")).map(_.drop(2).toLong).toSeq
      finally s.close()
    }
    assert(cat.currentVersion("snap_t") === Some(vs.max))
  }
  }

  test("withTableLock: two concurrent writers serialize — every commit " +
      "lands as its own version, none lost") {
    val root = java.nio.file.Files.createTempDirectory("cat-lock")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    val perWriter = 5
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val ts = (1 to 2).map { w =>
      new Thread(() => {
        try (1 to perWriter).foreach { i =>
          cat.replaceAtomic("locked_t",
            Seq((w.toLong, i.toLong)).toDF("writer", "seq"))
        } catch { case e: Throwable => failed.compareAndSet(null, e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failed.get() === null, s"writer failed: ${failed.get()}")
    // serialized commits: the committed version counts every write —
    // a lost update would leave currentVersion below 2*perWriter
    assert(cat.currentVersion("locked_t") === Some(2L * perWriter))
    assert(cat.read("locked_t").count() === 1L)
    // lock released
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("locked_t"), "_writer.lock")))
  }

  test("withTableLock: a stale lock from a crashed holder is stolen after " +
      "the lease; a fresh one blocks until released") {
    val root = java.nio.file.Files.createTempDirectory("cat-lock-stale")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    val dir = java.nio.file.Paths.get(cat.path("stale_t"))
    java.nio.file.Files.createDirectories(dir)
    val lock = dir.resolve("_writer.lock")
    java.nio.file.Files.createFile(lock)
    // age the lock past the lease
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    // steals and proceeds instead of wedging on the dead predecessor
    cat.replaceAtomic("stale_t", Seq((1L, "x")).toDF("k", "s"))
    assert(cat.read("stale_t").count() === 1L)
    assert(!java.nio.file.Files.exists(lock))
    // a LIVE holder's lock blocks the waiter until the holder releases
    val t0 = System.currentTimeMillis()
    var releasedAt = 0L
    val holder = new Thread(() =>
      cat.withTableLock("gate_t") {
        Thread.sleep(400); releasedAt = System.currentTimeMillis()
      })
    holder.start()
    Thread.sleep(100) // let the holder acquire first
    cat.withTableLock("gate_t") {
      assert(releasedAt > 0L, "waiter entered while holder still inside")
    }
    holder.join(10000)
    assert(System.currentTimeMillis() - t0 >= 400L)
  }

  committers.foreach { case (cname, cmtr) =>
  test(s"withTableLock[$cname]: N waiters racing ONE stale lock — exactly one body " +
      "at a time (meta-lease stale-break, r6 race)") {
    val root = java.nio.file.Files.createTempDirectory("cat-steal")
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = cmtr)
    val dir = java.nio.file.Paths.get(cat.path("race_t"))
    java.nio.file.Files.createDirectories(dir)
    val lock = dir.resolve("_writer.lock")
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    // the old delete-steal had a TOCTOU hole here: A judges stale, B
    // steals + re-creates, A's pending delete removes B's FRESH lock
    // and both run the body concurrently. With rename-steal exactly one
    // waiter wins each acquisition.
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val ts = (1 to 4).map { w =>
      new Thread(() => {
        try cat.withTableLock("race_t", leaseMs = 60000L) {
          if (inside.incrementAndGet() > 1) overlap.set(true)
          Thread.sleep(150)
          inside.decrementAndGet()
        } catch { case e: Throwable => failed.compareAndSet(null, e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failed.get() === null, s"waiter failed: ${failed.get()}")
    assert(!overlap.get(), "two stealers held the lock simultaneously")
    assert(!java.nio.file.Files.exists(lock))
  }
  }

  test("withTableLock: a LIVE holder outlasting the lease keeps the lock " +
      "(heartbeat) and release ignores a lock it does not own") {
    val root = java.nio.file.Files.createTempDirectory("cat-hb")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    // holder's body runs 3× the lease: without the mtime heartbeat a
    // waiter would judge it stale mid-write and steal (ADVICE r6 —
    // a large parquet job easily outlasts 60 s)
    val holder = new Thread(() =>
      cat.withTableLock("hb_t", leaseMs = 300L) {
        entered.countDown()
        if (inside.incrementAndGet() > 1) overlap.set(true)
        Thread.sleep(1000)
        inside.decrementAndGet()
      })
    holder.start()
    entered.await()
    Thread.sleep(400) // well past the lease — heartbeat must have refreshed
    // a deadline-bounded waiter still times out loudly on the live lock
    assertThrows[IllegalStateException] {
      cat.withTableLock("hb_t", leaseMs = 300L) { fail("entered while held") }
    }
    holder.join(30000)
    assert(!overlap.get())
    // release-by-token: a foreign lock placed after release is left alone
    val lock = java.nio.file.Paths.get(cat.path("hb_t"), "_writer.lock")
    java.nio.file.Files.write(lock, "someone-else".getBytes("UTF-8"))
    assert(java.nio.file.Files.exists(lock))
    java.nio.file.Files.delete(lock)
  }

  test("plain writes refuse a snapshot-versioned table (r6: deleteWhere " +
      "purge that deletes nothing)") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("cat-guard").toString)
    cat.replaceAtomic("vt", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    // before the guard: deleteWhere read through the pointer but wrote
    // survivors as plain files the pointer shadows — reported success,
    // every reader kept serving the purged rows
    assertThrows[IllegalArgumentException] {
      cat.deleteWhere("vt", "k", col("s") === "a")
    }
    assertThrows[IllegalArgumentException] {
      cat.overwrite("vt", Seq((9L, "z")).toDF("k", "s"))
    }
    assertThrows[IllegalArgumentException] {
      cat.append("vt", Seq((9L, "z")).toDF("k", "s"))
    }
    assertThrows[IllegalArgumentException] {
      cat.appendPartitioned("vt", Seq((9L, "z")).toDF("k", "s"), "k")
    }
    // the versioned path still works and readers see every row
    cat.replaceAtomic("vt", cat.read("vt").filter(col("s") =!= "a"))
    assert(cat.read("vt").collect().map(_.getString(1)).toSeq === Seq("b"))
  }

  test("markers are keyed by owner token; publishBatch commits N tables " +
      "under ONE marker that rides last") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("cat-pub").toString)
    cat.putMarker("m", 7L, "query-A")
    assert(cat.getMarker("m") === Some(7L))
    assert(cat.getMarkerFor("m", "query-A") === Some(7L))
    // a different incarnation reads the marker as absent — batch ids
    // restarting at 0 must not look already-applied (ADVICE r6)
    assert(cat.getMarkerFor("m", "query-B") === None)
    assert(cat.getMarkerWithToken("m") === Some((7L, "query-A")))

    cat.publishBatch("pub__commit", 0L, "q1", Seq(
      "pub_a" -> Seq((1L, "x")).toDF("id", "v"),
      "pub_b" -> Seq((1L, 10L), (2L, 20L)).toDF("id", "n")))
    cat.publishBatch("pub__commit", 1L, "q1", Seq(
      "pub_a" -> Seq((2L, "y")).toDF("id", "v"),
      "pub_b" -> Seq((3L, 30L)).toDF("id", "n")))
    assert(cat.getMarkerFor("pub__commit", "q1") === Some(1L))
    // partition discovery recovers batch_id; both batches visible
    val a = cat.read("pub_a")
    assert(a.columns.toSet === Set("id", "v", "batch_id"))
    // schemaless partition discovery infers batch_id as int — readers
    // wanting long pass an explicit schema, as the streaming path does
    assert(a.select(col("batch_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L))
    assert(cat.read("pub_b").count() === 3L)
    // a replay of batch 1 (crash before marker) rewrites its own
    // partition instead of duplicating
    cat.publishBatch("pub__commit", 1L, "q1", Seq(
      "pub_a" -> Seq((2L, "y")).toDF("id", "v"),
      "pub_b" -> Seq((3L, 30L)).toDF("id", "n")))
    assert(cat.read("pub_b").count() === 3L)
    // clean-slate drop for a foreign incarnation
    cat.dropBatchPartitions("pub_a")
    assert(!cat.exists("pub_a") || cat.read("pub_a").count() === 0L)
  }

  test("readVersion: time travel to the previous snapshot; pruned/unknown " +
      "versions fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("cat-tt")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("tt", Seq((1L, "old")).toDF("k", "s"))
    cat.replaceAtomic("tt", Seq((1L, "new"), (2L, "added")).toDF("k", "s"))
    assert(cat.versions("tt") === Seq(1L, 2L))
    assert(cat.readVersion("tt", 1L).collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet === Set((1L, "old")))
    assert(cat.readVersion("tt", 2L).count() === 2L)
    // current read still resolves the committed pointer
    assert(cat.read("tt").count() === 2L)
    // above the pointer: the committed-pointer guard fires first (a
    // crashed writer's partial _vN must never be served — r10 review)
    val e = intercept[IllegalArgumentException](cat.readVersion("tt", 9L))
    assert(e.getMessage.contains("never committed"))
  }

  test("replaceAtomic: aged-out snapshots prune, the previous one survives " +
      "regardless of age") {
    val root = java.nio.file.Files.createTempDirectory("cat-snap-ret")
    // retention 0: anything older than the previous snapshot may go at once
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      snapshotRetentionMs = 0L)
    (1 to 4).foreach { v =>
      cat.replaceAtomic("snap_r", Seq((v.toLong, s"v$v")).toDF("k", "s"))
    }
    val snaps = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(cat.path("snap_r")))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("_v\\d+")).map(_.drop(2).toLong).toSeq.sorted
      finally s.close()
    }
    // current (4) plus the always-kept previous (3); 1 and 2 pruned
    assert(snaps === Seq(3L, 4L))
    assert(cat.read("snap_r").head().getLong(0) === 4L)
  }

  test("replaceAtomic: migrates a legacy plain-file table and stays " +
      "readable through readOrEmpty/readScd2 paths") {
    val root = java.nio.file.Files.createTempDirectory("cat-snap-legacy")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.overwrite("dim_y_open", Seq((1L, "A")).toDF("k", "seg"))   // legacy layout
    assert(cat.currentVersion("dim_y_open").isEmpty)
    cat.replaceAtomic("dim_y_open", Seq((1L, "B"), (2L, "C")).toDF("k", "seg"))
    assert(cat.currentVersion("dim_y_open") === Some(1L))
    // shadowed legacy files are gone; reads resolve the snapshot
    assert(cat.read("dim_y_open").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet === Set((1L, "B"), (2L, "C")))
    val schema = cat.read("dim_y_open").schema
    assert(cat.readOrEmpty("dim_y_open", schema).count() === 2)
    val plain = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(cat.path("dim_y_open")))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(n => n.startsWith("_v") || n == "_version" ||
          n == "_history" || // the commit log is snapshot machinery
          n == "_fieldids.json") // the converting commit's own id marker
        .toSeq
      finally s.close()
    }
    assert(plain.isEmpty, s"legacy files not migrated: $plain")
  }

  test("compactClosed: a crash between the swap moves heals on rerun with no data loss") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.sql.Date
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("graft_crash_").toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("effective_from", org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("effective_to", org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("deleted_flg", org.apache.spark.sql.types.BooleanType)))
    def appendDay(i: Int): Unit =
      cat.appendPartitioned("dim_c_closed",
        Seq((i.toLong, s"S$i", Date.valueOf("2020-12-01"),
          Date.valueOf(f"2021-01-$i%02d"), true))
          .toDF("k", "seg", "effective_from", "effective_to", "deleted_flg"),
        "effective_to")

    (1 to 10).foreach(appendDay)
    assert(cat.compactClosed("dim_c", Date.valueOf("2021-01-11")) === 10)
    (11 to 15).foreach(appendDay)

    // simulate the crash window of a later run: the month dir was moved
    // aside but its replacement never landed
    val monthDir = Paths.get(cat.path("dim_c_closed_archive"), "effective_month=2021-01")
    Files.move(monthDir, monthDir.resolveSibling("_old_2021-01"),
      StandardCopyOption.ATOMIC_MOVE)

    // rerun must restore the committed month FIRST, then fold in the
    // leftover dates — previously-archived days 1-10 survive
    assert(cat.compactClosed("dim_c", Date.valueOf("2021-01-16")) === 5)
    val ks = cat.readScd2("dim_c", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ks === (1L to 15L), s"lost rows after crash-rerun: $ks")
    assert(!Files.exists(monthDir.resolveSibling("_old_2021-01")))
  }

  test("compactClosed: 30 daily partitions collapse into a month archive, readScd2 identical") {
    import java.nio.file.{Files, Paths}
    import java.sql.Date
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("graft_compact_").toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("effective_from", org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("effective_to", org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("deleted_flg", org.apache.spark.sql.types.BooleanType)))

    // 30 daily batches, each closing 3 keys — Runner's append pattern
    val days = (1 to 30).map(i => Date.valueOf(f"2021-01-$i%02d"))
    days.foreach { d =>
      val rows = (1L to 3L).map(j =>
        (d.toLocalDate.getDayOfMonth * 100L + j, s"SEG$j",
          Date.valueOf(d.toLocalDate.minusDays(10)), d, true))
        .toDF("k", "seg", "effective_from", "effective_to", "deleted_flg")
      cat.appendPartitioned("dim_x_closed", rows, "effective_to")
    }
    cat.replaceAtomic("dim_x_open",
      Seq((1L, "OPEN", Date.valueOf("2021-01-30"),
        Date.valueOf("3000-01-01"), false))
        .toDF("k", "seg", "effective_from", "effective_to", "deleted_flg"))

    def parquetFiles(table: String): Int =
      if (!Files.exists(Paths.get(cat.path(table)))) 0
      else {
        val s = Files.walk(Paths.get(cat.path(table)))
        try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
        finally s.close()
      }
    def content = cat.readScd2("dim_x", schema).collect().toSet

    val before = content
    val filesBefore = parquetFiles("dim_x_closed")
    assert(filesBefore >= 30)   // ≥1 file per date partition

    // archive everything before the 29th: 28 dates → ONE month dir
    assert(cat.compactClosed("dim_x", Date.valueOf("2021-01-29")) === 28)
    assert(content === before)
    assert(parquetFiles("dim_x_closed_archive") === 1)
    val closedDirs = {
      val s = Files.list(Paths.get(cat.path("dim_x_closed")))
      try s.iterator().asScala.count(_.getFileName.toString.startsWith("effective_to="))
      finally s.close()
    }
    assert(closedDirs === 2)   // only the 29th/30th stay fine-grained
    assert(parquetFiles("dim_x_closed") + parquetFiles("dim_x_closed_archive")
      < filesBefore)

    info(s"parquet files: before=$filesBefore, after=" +
      s"${parquetFiles("dim_x_closed")} closed + " +
      s"${parquetFiles("dim_x_closed_archive")} archive")

    // nothing older than the cutoff left → no-op
    assert(cat.compactClosed("dim_x", Date.valueOf("2021-01-29")) === 0)

    // later run folds the remaining dates into the EXISTING month
    assert(cat.compactClosed("dim_x", Date.valueOf("2021-02-01")) === 2)
    assert(content === before)
    assert(parquetFiles("dim_x_closed") === 0)
    assert(parquetFiles("dim_x_closed_archive") === 1)

    // time travel over the compacted layout: same rows as filtering the
    // full union, with the interval predicate pushed to storage
    val asOf = Date.valueOf("2021-01-15")
    val direct = cat.readScd2("dim_x", schema)
      .filter(s"effective_from <= date'$asOf' and date'$asOf' < effective_to")
      .collect().toSet
    val pruned = cat.readScd2AsOf("dim_x", schema, asOf)
    assert(pruned.collect().toSet === direct)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*effective_month".r.findFirstIn(plan).isDefined,
      s"archive month dirs not pruned:\n$plan")
  }

  test("deleteWhere: partition-scoped purge, untouched files byte-identical, emptied partitions cleared") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("gdpr").toString
    val cat = new TableCatalog(spark, root)
    // p1: mixed; p2: ALL rows match (must be fully cleared); p3: untouched
    val rows = Seq(
      (1L, "keep", "p1"), (2L, "purge", "p1"),
      (3L, "purge", "p2"), (4L, "purge", "p2"),
      (5L, "keep", "p3"), (6L, "keep", "p3"))
      .toDF("id", "tag", "p")
    cat.appendPartitioned("t", rows, "p")
    def mtimes(part: String): Map[String, Long] = {
      val d = Paths.get(s"$root/t/p=$part")
      if (!Files.exists(d)) Map.empty
      else Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    }
    val p3Before = mtimes("p3")
    Thread.sleep(5) // let any rewrite land a distinguishable mtime
    val (affected, gone) = cat.deleteWhere("t", "p", col("tag") === "purge")
    assert(affected.toSet === Set("p1", "p2") && gone === Seq("p2"))
    assert(cat.read("t").collect().map(r => (r.getLong(0), r.getString(2))).toSet
      === Set((1L, "p1"), (5L, "p3"), (6L, "p3")))
    // the untouched partition kept its exact files
    assert(mtimes("p3") === p3Before)
    // the fully-purged partition directory is gone (dynamic overwrite
    // alone cannot clear it)
    assert(!Files.exists(Paths.get(s"$root/t/p=p2")))
    // no-op when nothing matches
    assert(cat.deleteWhere("t", "p", col("tag") === "absent") === ((Nil, Nil)))
  }

  test("deleteWhere: NULL-evaluating rows survive (cond IS NOT TRUE semantics)") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("gdpr-null").toString
    val cat = new TableCatalog(spark, root)
    // nullable predicate column: rows 2 and 4 have tag NULL — the
    // condition evaluates to NULL there, which is NOT a match; a purge
    // must keep them (pre-fix !cond dropped them silently)
    val rows = Seq(
      (1L, Some("purge"), "p1"), (2L, Option.empty[String], "p1"),
      (3L, Some("keep"), "p1"), (4L, Option.empty[String], "p2"),
      (5L, Some("purge"), "p2"))
      .toDF("id", "tag", "p")
    cat.appendPartitioned("tn", rows, "p")
    val (affected, gone) = cat.deleteWhere("tn", "p", col("tag") === "purge")
    assert(affected.toSet === Set("p1", "p2") && gone.isEmpty)
    assert(cat.read("tn").select(col("id")).collect().map(_.getLong(0)).toSet
      === Set(2L, 3L, 4L))
  }

  test("deleteWhere: fully-purged partition with special characters in its " +
      "value is really cleared") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("gdpr-esc").toString
    val cat = new TableCatalog(spark, root)
    // partition values Spark percent-escapes in directory names: the
    // explicit-clear step must resolve the ESCAPED directory or the
    // purged rows silently survive
    val rows = Seq(
      (1L, "purge", "2024-01-01 00:00:00"),
      (2L, "purge", "a:b/c"),
      (3L, "keep", "plain"))
      .toDF("id", "tag", "p")
    cat.appendPartitioned("te", rows, "p")
    val (affected, gone) = cat.deleteWhere("te", "p", col("tag") === "purge")
    assert(affected.toSet === Set("2024-01-01 00:00:00", "a:b/c"))
    assert(gone.toSet === Set("2024-01-01 00:00:00", "a:b/c"))
    // the purged rows are unreadable afterwards — not merely unlisted
    assert(cat.read("te").select(col("id")).collect().map(_.getLong(0)).toSeq
      === Seq(3L))
    // and their directories are gone from disk
    val dirs = {
      val s = Files.list(java.nio.file.Paths.get(cat.path("te")))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("p=")).toSeq
      finally s.close()
    }
    assert(dirs.length === 1, s"leftover partition dirs: $dirs")
  }

  test("tags: a tagged snapshot survives the retention sweep; readTag " +
      "matches readVersion; dropTag makes it prunable") {
    val root = java.nio.file.Files.createTempDirectory("cat-tags")
    // retention 0: untagged superseded snapshots may prune immediately
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      snapshotRetentionMs = 0L)
    cat.replaceAtomic("tg", Seq((1L, "v1")).toDF("k", "s"))
    assert(cat.tag("tg", "release-1") === 1L)
    (2 to 5).foreach { v =>
      cat.replaceAtomic("tg", (1 to v).map(i => (i.toLong, s"v$v")).toDF("k", "s"))
    }
    // v1 pinned by the tag; v4 kept as immediately-previous; v2/v3 pruned
    assert(cat.versions("tg") === Seq(1L, 4L, 5L))
    assert(cat.tags("tg") === Map("release-1" -> 1L))
    assert(cat.readTag("tg", "release-1").collect().toSeq ===
      cat.readVersion("tg", 1L).collect().toSeq)
    // re-tagging moves the pointer atomically
    cat.tag("tg", "release-1")
    assert(cat.tags("tg") === Map("release-1" -> 5L))
    // the formerly pinned v1 is now prunable — next swap sweeps it
    cat.replaceAtomic("tg", Seq((9L, "v6")).toDF("k", "s"))
    assert(!cat.versions("tg").contains(1L))
    cat.dropTag("tg", "release-1")
    assert(cat.tags("tg").isEmpty)
    val e = intercept[IllegalArgumentException](cat.readTag("tg", "release-1"))
    assert(e.getMessage.contains("no tag"))
    intercept[IllegalArgumentException](cat.tag("tg", "../escape"))
  }

  test("analyze/stats: persisted rows + NDV; plain-table mutations " +
      "invalidate the sidecar") {
    val root = java.nio.file.Files.createTempDirectory("cat-stats")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.overwrite("f", Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "seg"))
    val st = cat.analyze("f")
    assert(st.rows === 3L && st.version.isEmpty)
    assert(st.ndv("k") === 3L && st.ndv("seg") === 2L)
    assert(st.sizeBytes > 0L)
    assert(cat.stats("f").contains(st)) // round-trips through the sidecar
    // an append changes the data → the sidecar must not survive to lie
    cat.append("f", Seq((4L, "c")).toDF("k", "seg"))
    assert(cat.stats("f").isEmpty)
  }

  test("stats-driven broadcast: the SAME join flips SortMergeJoin -> " +
      "BroadcastHashJoin when fresh stats prove the dim small, and flips " +
      "back when a new snapshot makes them stale") {
    val root = java.nio.file.Files.createTempDirectory("cat-stats-bhj")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    val dim = (1 to 50).map(i => (i.toLong, s"seg$i")).toDF("k", "seg")
    cat.replaceAtomic("dim_s", dim)
    val fact = spark.range(10000).select(
      (col("id") % 50 + 1).as("k"), col("id").as("amount"))
    def plan(d: org.apache.spark.sql.DataFrame): String =
      fact.join(d, "k").queryExecution.executedPlan.toString
    // isolate the stats effect: Spark's own filesize-threshold broadcast off
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val blind = plan(cat.readHinted("dim_s"))
      assert(blind.contains("SortMergeJoin") && !blind.contains("BroadcastHashJoin"),
        s"expected SMJ without stats:\n$blind")
      cat.analyze("dim_s")
      val informed = plan(cat.readHinted("dim_s"))
      assert(informed.contains("BroadcastHashJoin"),
        s"expected stats-driven BHJ:\n$informed")
      // a dim beyond the budget keeps the planner's choice
      val capped = plan(cat.readHinted("dim_s", broadcastBytes = 1L))
      assert(capped.contains("SortMergeJoin"), s"expected SMJ over budget:\n$capped")
      // new snapshot, no re-analyze: stats version mismatch → no hint
      cat.replaceAtomic("dim_s", dim.unionAll(Seq((51L, "seg51")).toDF("k", "seg")))
      val stale = plan(cat.readHinted("dim_s"))
      assert(stale.contains("SortMergeJoin"),
        s"stale stats must not broadcast:\n$stale")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("LogCommitter crash-replay: leftover inflight/write-aside files from " +
      "a crashed commit never corrupt the pointer; the next commit proceeds") {
    val root = java.nio.file.Files.createTempDirectory("cat-log-crash")
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = LogCommitter)
    cat.replaceAtomic("lt", Seq((1L, "v1")).toDF("k", "s"))
    assert(cat.currentVersion("lt") === Some(1L))
    // simulate a writer that died at every intermediate point: a fully
    // written but unmoved inflight slot, and a write-aside _version.tmp
    val dir = java.nio.file.Paths.get(cat.path("lt"))
    val log = dir.resolve("_version.__log")
    java.nio.file.Files.write(log.resolve(".inflight-deadbeef"),
      "999".getBytes)
    java.nio.file.Files.write(dir.resolve("_version.tmp"), "999".getBytes)
    // junk is invisible to reads and replaced commits win the next slot
    assert(cat.currentVersion("lt") === Some(1L))
    cat.replaceAtomic("lt", Seq((2L, "v2")).toDF("k", "s"))
    assert(cat.currentVersion("lt") === Some(2L))
    assert(cat.read("lt").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("LogCommitter compaction: hundreds of commits keep the log LIST " +
      "bounded, every intermediate read exact, numbering monotonic") {
    val root = java.nio.file.Files.createTempDirectory("cat-log-compact")
    val p = root.resolve("ptr")
    def commit(s: String): Unit = {
      val tmp = root.resolve(s".t-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, s.getBytes)
      LogCommitter.atomicRename(tmp, p)
    }
    (1 to 500).foreach { i =>
      commit(i.toString)
      // reads stay exact at every commit, including mid-window ones
      // whose slot a compaction may have just folded away
      assert(new String(LogCommitter.read(p).get) === i.toString)
    }
    def logFiles() = {
      val s = java.nio.file.Files.list(root.resolve("ptr.__log"))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq }
      finally s.close()
    }
    // 500 commits, O(CompactEvery) LIST — the log stopped growing
    assert(logFiles().size <= LogCommitter.CompactEvery + 2,
      s"log not bounded: ${logFiles().sorted}")
    // the number line survives compaction: the surviving max entry is
    // still numbered >= 500 (checkpoints carry the slot numbers)
    assert(logFiles().map(_.drop(1).toLong).max >= 500L)
    // tombstone + recommit keep working through a compacted log
    LogCommitter.delete(p)
    assert(LogCommitter.read(p).isEmpty)
    commit("after")
    assert(new String(LogCommitter.read(p).get) === "after")
    // concurrent writers racing across compaction windows: all commits
    // land, the final read is one of the written values, LIST stays flat.
    // A reader hammers the pointer throughout — every mid-race read must
    // resolve a committed value (the checkpoint-before-delete ordering),
    // never absent, never a torn/partial value.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(9)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = pool.submit(new Runnable {
      def run(): Unit = while (!stop.get()) {
        val v = LogCommitter.read(p).map(new String(_))
        if (!v.exists(s => s == "after" || s.matches("w\\d-\\d+")))
          throw new AssertionError(s"mid-race read resolved $v")
      }
    })
    val futs = (1 to 8).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = (1 to 40).foreach(i => commit(s"w$w-$i")) })
    }
    futs.foreach(_.get()); stop.set(true); reader.get(); pool.shutdown()
    val fin = new String(LogCommitter.read(p).get)
    assert(fin.matches("w\\d-40"), s"final commit must be some writer's last: $fin")
    assert(logFiles().size <= LogCommitter.CompactEvery + 4,
      s"log regrew under concurrency: ${logFiles().sorted}")

    // crash injection: every intermediate compaction state a crash can
    // leave behind must read correctly and converge on later commits
    val crash = root.resolve("crashptr")
    val clog = root.resolve("crashptr.__log")
    java.nio.file.Files.createDirectories(clog)
    def slotFile(kind: Char, i: Long, v: String): Unit =
      java.nio.file.Files.write(
        clog.resolve(kind + ("%020d".format(i))), v.getBytes)
    (1L to 5L).foreach(i => slotFile('s', i, s"v$i"))
    // (a) crashed AFTER checkpoint write, BEFORE subsumed-slot deletion:
    // a stale c3 below live slots — highest entry (s5) must still win
    slotFile('c', 3L, "v3")
    assert(new String(LogCommitter.read(crash).get) === "v5")
    // (b) commits continue over the crashed state; numbering stays
    // monotonic past both slots and the stale checkpoint
    (6L to 20L).foreach { i =>
      val tmp = root.resolve(s".t$i")
      java.nio.file.Files.write(tmp, s"v$i".getBytes)
      LogCommitter.atomicRename(tmp, crash)
      assert(new String(LogCommitter.read(crash).get) === s"v$i")
    }
    // (c) the compactions triggered along the way cleaned the crash
    // debris: stale c3 and the pre-crash slots are gone, log bounded
    val crashFiles = {
      val s = java.nio.file.Files.list(clog)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq }
      finally s.close()
    }
    assert(!crashFiles.contains("c" + "%020d".format(3L)),
      s"stale checkpoint survived compaction: ${crashFiles.sorted}")
    assert(crashFiles.size <= LogCommitter.CompactEvery + 2,
      s"crash debris kept the log unbounded: ${crashFiles.sorted}")

    // catalog-level: a log-backed table through dozens of swap+analyze
    // cycles keeps a bounded _version log and exact reads
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = LogCommitter)
    (1 to 30).foreach { i =>
      cat.replaceAtomic("ct", Seq((i.toLong, s"v$i")).toDF("k", "s")) }
    assert(cat.currentVersion("ct") === Some(30L))
    assert(cat.read("ct").collect().map(_.getLong(0)).toSeq === Seq(30L))
    val vlog = java.nio.file.Paths.get(cat.path("ct"), "_version.__log")
    val s = java.nio.file.Files.list(vlog)
    val n = try s.count() finally s.close()
    assert(n <= LogCommitter.CompactEvery + 2, s"_version log unbounded: $n files")
  }

  test("LogCommitter: markers + publishBatch commit through the log and " +
      "replay idempotently after a crash between publish and marker") {
    val root = java.nio.file.Files.createTempDirectory("cat-log-pub")
    val cat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = LogCommitter)
    def payload(v: Long) = Seq((v, s"b$v")).toDF("k", "s")
    cat.publishBatch("_m/q1", 0L, "tokA", Seq("out1" -> payload(10L)))
    assert(cat.getMarkerFor("_m/q1", "tokA") === Some(0L))
    // crash window: batch 1's tables landed but the marker commit was
    // lost — the replayed batch must overwrite the same batch_id
    // partitions (not duplicate) and land the marker exactly once
    cat.publishBatch("_m/q1", 1L, "tokA", Seq("out1" -> payload(11L)))
    cat.publishBatch("_m/q1", 1L, "tokA", Seq("out1" -> payload(11L)))
    assert(cat.getMarkerFor("_m/q1", "tokA") === Some(1L))
    assert(cat.read("out1").count() === 2L) // batch 0 + one copy of batch 1
    // a different checkpoint incarnation reads the marker as absent
    assert(cat.getMarkerFor("_m/q1", "tokB").isEmpty)
  }

  test("LogCommitter migration: pointers committed by PosixCommitter keep " +
      "resolving, and the first log commit supersedes them") {
    val root = java.nio.file.Files.createTempDirectory("cat-log-mig")
    val posixCat = new TableCatalog(spark, root.resolve("wh").toString)
    posixCat.replaceAtomic("mt", Seq((1L, "posix")).toDF("k", "s"))
    posixCat.tag("mt", "rel")
    val logCat = new TableCatalog(spark, root.resolve("wh").toString,
      committer = LogCommitter)
    // plain-file pointers resolve through the fallback read
    assert(logCat.currentVersion("mt") === Some(1L))
    assert(logCat.tags("mt") === Map("rel" -> 1L))
    logCat.replaceAtomic("mt", Seq((2L, "log")).toDF("k", "s"))
    assert(logCat.currentVersion("mt") === Some(2L))
    assert(logCat.read("mt").collect().map(_.getString(1)).toSeq === Seq("log"))
    // tags written via the log coexist with the legacy plain tag
    logCat.tag("mt", "rel2")
    assert(logCat.tags("mt") === Map("rel" -> 1L, "rel2" -> 2L))
    logCat.dropTag("mt", "rel")
    assert(logCat.tags("mt") === Map("rel2" -> 2L))
  }

  test("estimateJoinRows: the System-R metadata estimate tracks the exact " +
      "join size on FK-shaped data and refuses stale or unanalyzed inputs") {
    val root = java.nio.file.Files.createTempDirectory("cat-joinest")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    // dim: 50 unique keys; fact: 4000 rows uniformly over those keys
    cat.replaceAtomic("dim_j", (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    cat.replaceAtomic("fact_j", spark.range(4000)
      .select((col("id") % 50 + 1).as("k"), col("id").as("m")))
    assert(cat.estimateJoinRows("fact_j", "k", "dim_j", "k").isEmpty,
      "no stats yet -> no estimate")
    cat.analyze("dim_j"); cat.analyze("fact_j")
    val est = cat.estimateJoinRows("fact_j", "k", "dim_j", "k").get
    val exact = cat.read("fact_j").join(cat.read("dim_j"), "k").count()
    assert(exact === 4000L)
    // NDV is HLL-approximate (±2%): the estimate must land within 10%
    assert(math.abs(est - exact) <= exact / 10, s"est=$est exact=$exact")
    // unanalyzed key column -> None
    assert(cat.estimateJoinRows("fact_j", "nope", "dim_j", "k").isEmpty)
    // a new snapshot makes one side's stats stale -> None
    cat.replaceAtomic("dim_j", (1 to 60).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    assert(cat.estimateJoinRows("fact_j", "k", "dim_j", "k").isEmpty)
  }

  test("joinPlanned: the join's shuffle width is DRIVEN by persisted stats " +
      "(partition count tracks estimated output rows) and falls back to the " +
      "session default when stats go stale") {
    val root = java.nio.file.Files.createTempDirectory("cat-joinplan")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    cat.replaceAtomic("dim_p", (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    cat.replaceAtomic("fact_p", spark.range(4000)
      .select((col("id") % 50 + 1).as("k"), col("id").as("m")))
    cat.analyze("dim_p"); cat.analyze("fact_p")
    // ~4000 estimated output rows at 500 rows/task -> 8 partitions: the
    // width comes from the ESTIMATE, not spark.sql.shuffle.partitions
    // (broadcastBytes = 0 forces the repartition branch for the width
    // assertions; the broadcast branch is asserted separately below)
    val est = cat.estimateJoinRows("fact_p", "k", "dim_p", "k").get
    val wantP = ((est + 499) / 500).toInt
    val planned = cat.joinPlanned("fact_p", "k", "dim_p", "k",
      rowsPerTask = 500L, broadcastBytes = 0L)
    assert(planned.count() === 4000L)
    assert(planned.rdd.getNumPartitions === wantP,
      s"planned width must track the estimate ($est rows / 500)")
    assert(planned.rdd.getNumPartitions !==
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      "test must exercise a non-default width")
    // same estimate, huge rowsPerTask -> clamps to 1
    assert(cat.joinPlanned("fact_p", "k", "dim_p", "k",
      rowsPerTask = Long.MaxValue, broadcastBytes = 0L)
      .rdd.getNumPartitions === 1)
    // fresh stats proving the dim small -> the no-shuffle broadcast
    // branch: neither side repartitions, the join hash-builds on the dim
    val bcJoined = cat.joinPlanned("fact_p", "k", "dim_p", "k",
      rowsPerTask = 500L)
    assert(bcJoined.count() === 4000L)
    assert(bcJoined.queryExecution.executedPlan.toString.contains("Broadcast"),
      "small-side fresh stats must take the broadcast branch")
    assert(bcJoined.rdd.getNumPartitions !== wantP,
      "broadcast branch must not pay the planned repartition")
    // stale stats (new snapshot, no re-analyze) -> plain join, results
    // identical, width back under the planner/session default regime
    cat.replaceAtomic("dim_p", (1 to 50).map(i => (i.toLong, s"w$i")).toDF("k", "v"))
    val stale = cat.joinPlanned("fact_p", "k", "dim_p", "k", rowsPerTask = 500L)
    assert(stale.count() === 4000L)
    assert(stale.rdd.getNumPartitions !== wantP,
      "stale stats must not keep driving the planned width")
  }

  test("vacuum: every crash-residue class deleted, grace window spares the " +
      "young, committed state byte-for-byte untouched") {
    import java.nio.file.{Files, Paths}
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("graft_vac_").toString)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    cat.replaceAtomic("t", df)
    cat.replaceAtomic("t", df.filter(col("k") === 1L))
    cat.tag("t", "pin")
    cat.analyze("t")
    val dir = Paths.get(cat.path("t"))
    def age(p: java.nio.file.Path): Unit = Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    // the three residue classes, all aged 2 minutes
    Files.write(dir.resolve("_version.tmp"), "9".getBytes)
    Files.write(dir.resolve("_stats.json.tmp-dead"), "{}".getBytes)
    Files.write(dir.resolve("_tagtmp_x-dead"), "1".getBytes)
    val orphan = dir.resolve("_v99")
    Files.createDirectory(orphan)
    Files.write(orphan.resolve("dead.parquet"), Array.fill(32)(7.toByte))
    val stage = dir.resolve("_tmp_1999-01")
    Files.createDirectory(stage)
    Files.write(stage.resolve("dead"), Array.fill(8)(7.toByte))
    Seq(dir.resolve("_version.tmp"), dir.resolve("_stats.json.tmp-dead"),
      dir.resolve("_tagtmp_x-dead"), orphan, stage).foreach(age)
    // plus one residue file YOUNGER than the grace window
    Files.write(dir.resolve("_stats.json.tmp-young"), "{}".getBytes)

    val rep = cat.vacuum("t", graceMs = 60000L)
    assert(rep.map(r => (r._1, r._2)) === Seq(("staging", 1L),
      ("uncommitted_snapshot", 1L), ("write_aside", 3L)))
    assert(rep.forall(_._3 > 0L), s"bytes must be accounted: $rep")
    assert(!Files.exists(orphan) && !Files.exists(stage))
    assert(Files.exists(dir.resolve("_stats.json.tmp-young")),
      "grace window must spare young residue")
    // a second pass with grace 0 sweeps the straggler (mtime <= cutoff:
    // same-millisecond files are NOT flaky-spared)
    assert(cat.vacuum("t", graceMs = 0L).map(r => (r._1, r._2)) ===
      Seq(("write_aside", 1L)))
    assert(cat.vacuum("t", graceMs = 0L).isEmpty, "vacuum is idempotent")
    // committed state untouched
    assert(cat.currentVersion("t") === Some(2L))
    assert(cat.versions("t") === Seq(1L, 2L))
    assert(cat.read("t").count() === 1L)
    assert(cat.readTag("t", "pin").count() === 1L)
    assert(cat.stats("t").isDefined, "committed sidecar must survive")
    // unknown table: no-op, not an error
    assert(cat.vacuum("never_written") === Seq.empty)
  }
}
