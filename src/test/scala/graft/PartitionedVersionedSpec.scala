package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** PARTITIONED VERSIONED tables (r13 verdict #1) — the two table
  * worlds unified: `_vN` snapshots holding whole Hive leaf trees, so
  * partition-pruned scans, O(changed leaves) DML, time travel, history
  * and O(delta) change feeds coexist on one table. */
class PartitionedVersionedSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("pv").toString
    seq += 1
    val name = s"gpv$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  private def fact(dt: String, ks: Range) =
    ks.map(k => (k.toLong, k.toLong * 10, dt)).toDF("k", "v", "dt")

  private def leafFiles(cat: TableCatalog, t: String, v: Long,
      leaf: String): Seq[String] = {
    val d = Paths.get(cat.path(t), s"_v$v", leaf)
    if (!Files.exists(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
  }

  test("create + append two dates: snapshots, time travel, history; " +
      "carried leaves hard-link (same inode, no bytes copied)") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("f",
      fact("x", 0 until 0).schema, Seq("dt"))
    assert(cat.currentVersion("f") === Some(1L))
    assert(cat.read("f").count() === 0L) // empty v1 reads under the spec
    val v2 = cat.appendPartitionedVersioned("f", fact("2024-01-01", 0 until 8))
    val v3 = cat.appendPartitionedVersioned("f", fact("2024-01-02", 8 until 20))
    assert((v2, v3) === (2L, 3L))
    assert(cat.read("f").count() === 20L)
    // time travel reaches every state
    assert(cat.readVersion("f", 1L).count() === 0L)
    assert(cat.readVersion("f", 2L).count() === 8L)
    assert(cat.readVersion("f", 2L).select("dt").distinct().as[String]
      .collect().toSeq === Seq("2024-01-01"))
    // partition values come from the directory names, typed declared
    assert(cat.read("f").schema.fieldNames.toSeq === Seq("k", "v", "dt"))
    assert(cat.read("f").filter($"dt" === "2024-01-02").count() === 12L)
    // the carried leaf's files are the SAME inodes in v2 and v3 —
    // an append never rewrites existing data
    val carried = leafFiles(cat, "f", 2L, "dt=2024-01-01")
    assert(carried.nonEmpty &&
      carried === leafFiles(cat, "f", 3L, "dt=2024-01-01"))
    carried.foreach { n =>
      assert(Files.isSameFile(
        Paths.get(cat.path("f"), "_v2", "dt=2024-01-01", n),
        Paths.get(cat.path("f"), "_v3", "dt=2024-01-01", n)),
        s"$n must be a hard link, not a copy")
    }
    assert(cat.history("f").count() >= 3L)
  }

  test("CDC between versions is O(delta): only the appended leaf's " +
      "files contribute; the classified feed works over keys") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("c",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("c", fact("2024-01-01", 0 until 5))
    cat.appendPartitionedVersioned("c", fact("2024-01-02", 5 until 9))
    val (ins, del, addedF, removedF) = cat.changedRowsBetween("c", 2L, 3L)
    assert(del.count() === 0L)
    assert(removedF.isEmpty)
    assert(ins.count() === 4L)
    assert(ins.select("dt").distinct().as[String].collect().toSeq ===
      Seq("2024-01-02"))
    // partition values survive the feed read (basePath discovery)
    assert(ins.select("k").as[Long].collect().sorted.toSeq ===
      Seq(5L, 6L, 7L, 8L))
    val feed = cat.changesBetween("c", 2L, 3L, Seq("k"))
    assert(feed.filter($"change_type" === "insert").count() === 4L)
  }

  test("partition-granular DELETE rewrites ONE leaf as a snapshot " +
      "commit; untouched leaves hard-link through; time travel keeps " +
      "the pre-delete state") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("d",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("d", fact("2024-01-01", 0 until 6))
    cat.appendPartitionedVersioned("d", fact("2024-01-02", 6 until 12))
    val keepFiles = leafFiles(cat, "d", 3L, "dt=2024-01-02")
    val (affected, gone) = cat.deleteWherePartsVersioned("d",
      $"dt" === "2024-01-01" && $"k" < 3L)
    assert(affected === Seq(Seq(Some("2024-01-01"))) && gone.isEmpty)
    assert(cat.currentVersion("d") === Some(4L))
    assert(cat.read("d").filter($"dt" === "2024-01-01").count() === 3L)
    assert(cat.read("d").count() === 9L)
    // the untouched leaf carried byte-identical (linked) files
    assert(leafFiles(cat, "d", 4L, "dt=2024-01-02") === keepFiles)
    keepFiles.foreach(n => assert(Files.isSameFile(
      Paths.get(cat.path("d"), "_v3", "dt=2024-01-02", n),
      Paths.get(cat.path("d"), "_v4", "dt=2024-01-02", n))))
    // pre-delete state is one time travel away
    assert(cat.readVersion("d", 3L).count() === 12L)
    // a fully-covered purge is METADATA-ONLY: no data files written
    val before = leafFiles(cat, "d", 4L, "dt=2024-01-02")
    cat.dropPartitionsVersioned("d", Seq(Seq(Some("2024-01-02"))))
    assert(cat.read("d").count() === 3L)
    assert(leafFiles(cat, "d", 5L, "dt=2024-01-02").isEmpty)
    // the survivor leaf in v5 is all links (same inodes as v4)
    leafFiles(cat, "d", 5L, "dt=2024-01-01").foreach(n =>
      assert(Files.isSameFile(
        Paths.get(cat.path("d"), "_v4", "dt=2024-01-01", n),
        Paths.get(cat.path("d"), "_v5", "dt=2024-01-01", n))))
    assert(before.nonEmpty) // sanity: the dropped leaf did hold files
  }

  test("OPTIMIZE on a partitioned versioned table compacts per leaf " +
      "as ONE dataChange=false snapshot: content identical, the change " +
      "feed skips it from commit metadata") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("o",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("o", fact("2024-01-01", 0 until 4))
    cat.appendPartitionedVersioned("o", fact("2024-01-01", 4 until 8))
    val before = cat.read("o").orderBy("k").collect().toSeq
    assert(leafFiles(cat, "o", 3L, "dt=2024-01-01").size >= 2)
    val rep = cat.compactPartitionsVersioned("o", minFiles = 2)
    assert(rep.nonEmpty, "compaction must report the compacted leaf")
    assert(cat.currentVersion("o") === Some(4L))
    assert(leafFiles(cat, "o", 4L, "dt=2024-01-01").size === 1)
    assert(cat.read("o").orderBy("k").collect().toSeq === before,
      "compaction must preserve content byte-for-row")
    // an optimize-only interval answers EMPTY from commit metadata
    val (ins, del, af, rf) = cat.changedRowsBetween("o", 3L, 4L)
    assert(ins.count() === 0L && del.count() === 0L)
    assert(af.isEmpty && rf.isEmpty,
      "a dataChange=false commit must list zero files in the feed")
    // a feed STRADDLING it reads only the real append's delta
    val (ins2, del2, _, _) = cat.changedRowsBetween("o", 2L, 4L)
    assert(ins2.count() === 4L && del2.count() === 0L)
    assert(ins2.select("k").as[Long].collect().sorted.toSeq ===
      Seq(4L, 5L, 6L, 7L))
  }

  test("RESTORE on a partitioned versioned table links the old leaf " +
      "tree as a NEW snapshot: history stays monotonic, zero bytes copy") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("r",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("r", fact("2024-01-01", 0 until 5)) // v2
    cat.appendPartitionedVersioned("r", fact("2024-01-02", 5 until 9)) // v3
    cat.dropPartitionsVersioned("r", Seq(Seq(Some("2024-01-01"))))     // v4
    assert(cat.read("r").count() === 4L)
    val nv = cat.restore("r", 2L)
    assert(nv === 5L && cat.currentVersion("r") === Some(5L))
    assert(cat.read("r").count() === 5L)
    assert(cat.read("r").select("dt").distinct().as[String]
      .collect().toSeq === Seq("2024-01-01"))
    // the restored leaf is LINKS to v2's files, not copies
    val names = leafFiles(cat, "r", 2L, "dt=2024-01-01")
    assert(names.nonEmpty &&
      names === leafFiles(cat, "r", 5L, "dt=2024-01-01"))
    names.foreach(n => assert(Files.isSameFile(
      Paths.get(cat.path("r"), "_v2", "dt=2024-01-01", n),
      Paths.get(cat.path("r"), "_v5", "dt=2024-01-01", n))))
    // the "bad" intermediate states stay inspectable
    assert(cat.readVersion("r", 4L).count() === 4L)
  }

  test("flat-versioned verbs refuse: appendAtomic / replaceAtomic / " +
      "branches / OPTIMIZE would land flat files into a leaf-tree " +
      "snapshot") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("g",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("g", fact("2024-01-01", 0 until 3))
    Seq[(String, () => Any)](
      ("appendAtomic", () => cat.appendAtomic("g", fact("d", 0 until 1))),
      ("replaceAtomic", () => cat.replaceAtomic("g", fact("d", 0 until 1))),
      ("widenColumn", () => cat.widenColumn("g", "v",
        org.apache.spark.sql.types.DecimalType(20, 0)))
    ).foreach { case (name, f) =>
      val e = intercept[Exception](f())
      assert(e.getMessage.contains("PARTITIONED versioned"),
        s"$name must refuse: ${e.getMessage}")
    }
    // branches are no longer refused — they stage leaf trees (r15);
    // PvBranchSpec covers the full WAP loop
    cat.appendToBranch("g", "wap", fact("2024-01-02", 0 until 1))
    assert(cat.readBranch("g", "wap").count() === 4L)
    cat.dropBranch("g", "wap")
    // and the plain-partitioned verbs refuse too (wrong layout)
    val e2 = intercept[Exception](
      cat.insertPartitioned("g", fact("2024-01-01", 0 until 1)))
    assert(e2.getMessage.contains("VERSIONED"), e2.getMessage)
  }

  test("SQL surface: CREATE TBLPROPERTIES(versioned), INSERT INTO, " +
      "leaf-pruned SELECT, VERSION AS OF, partition-pruned DELETE, " +
      "INSERT OVERWRITE; UPDATE refuses loudly") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.f (k BIGINT, v BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
    assert(cat.partitionSpecVersioned("f"))
    spark.sql(s"INSERT INTO $g.f VALUES (1, 10, '2024-01-01'), " +
      "(2, 20, '2024-01-01'), (3, 30, '2024-01-02')")
    spark.sql(s"INSERT INTO $g.f VALUES (4, 40, '2024-01-02')")
    assert(cat.currentVersion("f") === Some(3L))
    assert(spark.sql(s"SELECT sum(v) FROM $g.f").as[Long].head() === 100L)
    // identity partition pruning happens inside the snapshot dir
    val pruned = spark.sql(s"SELECT k FROM $g.f WHERE dt = '2024-01-01'")
    assert(pruned.as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(spark.sql(s"SELECT count(*) FROM $g.f VERSION AS OF 2")
      .as[Long].head() === 3L)
    // partition-pruned SQL DELETE commits one snapshot
    spark.sql(s"DELETE FROM $g.f WHERE dt = '2024-01-01'")
    assert(spark.sql(s"SELECT count(*) FROM $g.f").as[Long].head() === 2L)
    assert(cat.readVersion("f", 3L).count() === 4L) // pre-delete retained
    spark.sql(s"INSERT OVERWRITE $g.f VALUES (9, 90, '2024-02-01')")
    assert(spark.sql(s"SELECT k FROM $g.f").as[Long].collect().toSeq ===
      Seq(9L))
    assert(cat.readVersion("f", cat.currentVersion("f").get - 1)
      .count() === 2L)
  }

  test("SQL UPDATE and MERGE on a partitioned versioned table commit " +
      "as snapshot replaces: a dt-scoped UPDATE rewrites ONE leaf, " +
      "untouched leaves hard-link, time travel keeps the pre-DML state") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.u (k BIGINT, v BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.u VALUES (1, 10, 'a'), (2, 20, 'a'), " +
      "(3, 30, 'b'), (4, 40, 'b')") // v2
    val keep = leafFiles(cat, "u", 2L, "dt=b")
    spark.sql(s"UPDATE $g.u SET v = v + 1 WHERE dt = 'a' AND k = 1")
    assert(cat.currentVersion("u") === Some(3L))
    assert(spark.sql(s"SELECT v FROM $g.u ORDER BY k").as[Long]
      .collect().toSeq === Seq(11L, 20L, 30L, 40L))
    // the unscanned leaf carried byte-identical links
    assert(leafFiles(cat, "u", 3L, "dt=b") === keep)
    keep.foreach(n => assert(Files.isSameFile(
      Paths.get(cat.path("u"), "_v2", "dt=b", n),
      Paths.get(cat.path("u"), "_v3", "dt=b", n)),
      "a dt-scoped UPDATE must not rewrite the other leaf"))
    assert(cat.readVersion("u", 2L).filter($"k" === 1L)
      .select("v").as[Long].head() === 10L, "pre-update state retained")
    // MERGE: one matched update, one not-matched insert into a NEW leaf
    Seq((2L, 99L, "a"), (9L, 90L, "c")).toDF("k", "v", "dt")
      .createOrReplaceTempView("src_u")
    spark.sql(s"MERGE INTO $g.u t USING src_u s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql(s"SELECT k, v FROM $g.u ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 11L), (2L, 99L), (3L, 30L), (4L, 40L), (9L, 90L)))
    assert(Files.exists(Paths.get(cat.path("u"),
      s"_v${cat.currentVersion("u").get}", "dt=c")),
      "MERGE's not-matched insert must land a new leaf")
  }

  test("a days(ts) TRANSFORM spec over the versioned layout: hidden " +
      "column, UTC leaves inside the snapshot, source-predicate " +
      "pruning serves only matching leaves") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.tv (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.tv SELECT id AS k, " +
      "timestamp'2024-03-01 00:30:00' + make_interval(0,0,0,0,CAST(id AS INT)) AS ts " +
      "FROM range(72)") // 3 days
    assert(Files.exists(Paths.get(cat.path("tv"), "_v2",
      "ts_day=2024-03-01")))
    assert(spark.sql(s"SELECT * FROM $g.tv").columns.toSeq ===
      Seq("k", "ts"))
    val q = spark.sql(s"SELECT k FROM $g.tv " +
      "WHERE ts >= timestamp'2024-03-03 00:00:00'")
    assert(q.count() === 24L)
    val dirs = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.map(f => f.split("/").find(_.startsWith("ts_day="))
      .getOrElse("?")).toSet
    assert(dirs === Set("ts_day=2024-03-03"), s"pruning served $dirs")
    // append another day: the three old leaves hard-link through
    spark.sql(s"INSERT INTO $g.tv SELECT 100 + id AS k, " +
      "timestamp'2024-03-04 06:00:00' AS ts FROM range(2)")
    assert(spark.sql(s"SELECT count(*) FROM $g.tv").as[Long].head() === 74L)
    val n = leafFiles(cat, "tv", 2L, "ts_day=2024-03-01")
    assert(n === leafFiles(cat, "tv", 3L, "ts_day=2024-03-01"))
  }

  test("pv lifecycle: CHECK constraints enforce on append, TIMESTAMP " +
      "AS OF and tags resolve snapshots, vacuum never eats linked data") {
    val (cat, g) = freshSqlCat()
    cat.createPartitionedVersioned("lc",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.addConstraint("lc", "v_pos", "v >= 0")
    cat.appendPartitionedVersioned("lc", fact("2024-01-01", 0 until 3))
    val bad = intercept[Exception] {
      cat.appendPartitionedVersioned("lc",
        Seq((99L, -5L, "2024-01-01")).toDF("k", "v", "dt"))
    }
    assert(bad.getMessage.toLowerCase.contains("constraint") ||
      bad.getMessage.contains("v_pos"), bad.getMessage)
    assert(cat.read("lc").count() === 3L, "a refused append lands nothing")
    val tsAfterV2 = System.currentTimeMillis()
    Thread.sleep(5)
    cat.appendPartitionedVersioned("lc", fact("2024-01-02", 3 until 7))
    cat.tag("lc", "after_first")
    assert(spark.sql(s"SELECT count(*) FROM $g.lc TIMESTAMP AS OF " +
      s"'${new java.sql.Timestamp(tsAfterV2)}'").as[Long].head() === 3L)
    // vacuum sweeps staging residue but linked snapshot data survives
    cat.vacuum("lc", graceMs = 0L)
    assert(cat.read("lc").count() === 7L)
    assert(cat.readTag("lc", "after_first").count() === 7L)
  }

  test("per-file skipping inside a pv SNAPSHOT: ANALYZE + prunedRead " +
      "open fewer files than the leaves hold; a later append stales " +
      "the manifest loudly") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("sk",
      fact("x", 0 until 0).schema, Seq("dt"))
    // range-clustered: 4 files per leaf with disjoint k ranges
    cat.appendPartitionedVersioned("sk",
      fact("2024-01-01", 0 until 400)
        .repartitionByRange(4, $"k"))
    cat.analyze("sk", cols = Seq("k"), skipCols = Seq("k"))
    val pruned = cat.prunedRead("sk", Seq(("k", 100L, 150L)))
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      (100L to 150L))
    assert(pruned.schema.fieldNames.toSeq === Seq("k", "v", "dt"))
    val leafCount = leafFiles(cat, "sk", 2L, "dt=2024-01-01").size
    assert(leafCount >= 4)
    assert(pruned.inputFiles.length < leafCount,
      s"skipping must open fewer than the leaf's $leafCount files")
    // a snapshot commit invalidates the stats head — the pruned read
    // refuses loudly (never serves a stale manifest silently)
    cat.appendPartitionedVersioned("sk", fact("2024-01-02", 400 until 410))
    val e = intercept[Exception](cat.prunedRead("sk", Seq(("k", 0L, 1L))))
    assert(e.getMessage.contains("stale") ||
      e.getMessage.contains("no skipping index"), e.getMessage)
  }

  test("CLONE of a partitioned versioned table preserves the leaf " +
      "tree by relative-path links; the spec sidecar travels; the " +
      "clone mutates independently") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("cs",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("cs", fact("2024-01-01", 0 until 4))
    cat.appendPartitionedVersioned("cs", fact("2024-01-02", 4 until 9))
    cat.cloneTable("cs", "cd")
    assert(cat.partitionSpecVersioned("cd"), "the versioned flag travels")
    assert(cat.read("cd").count() === 9L)
    assert(cat.read("cd").filter($"dt" === "2024-01-02")
      .select("k").as[Long].collect().sorted.toSeq === (4L to 8L),
      "partition values must survive the clone (leaf tree, not flat)")
    // links, not copies
    val names = leafFiles(cat, "cs", 3L, "dt=2024-01-01")
    assert(names.nonEmpty && names === leafFiles(cat, "cd", 1L,
      "dt=2024-01-01"))
    names.foreach(n => assert(Files.isSameFile(
      Paths.get(cat.path("cs"), "_v3", "dt=2024-01-01", n),
      Paths.get(cat.path("cd"), "_v1", "dt=2024-01-01", n))))
    // independence: a clone-side partition drop never touches the source
    cat.dropPartitionsVersioned("cd", Seq(Seq(Some("2024-01-01"))))
    assert(cat.read("cd").count() === 5L)
    assert(cat.read("cs").count() === 9L)
  }

  test("ADD COLUMN on a partitioned versioned table is a sidecar " +
      "update that PRESERVES the versioned flag; old rows null-fill") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.ac (k BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.ac VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $g.ac ADD COLUMN tag STRING")
    assert(cat.partitionSpecVersioned("ac"), "the flag must survive ALTER")
    spark.sql(s"INSERT INTO $g.ac VALUES (2, 'a', 'x')")
    val rows = spark.sql(s"SELECT k, tag FROM $g.ac ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows === Seq((1L, None), (2L, Some("x"))))
  }

  test("pv commits carry via the leaf MANIFEST: untouched leaves are " +
      "never re-walked; a pre-manifest snapshot pays one walk that " +
      "mints its manifest; heads stay hash-identical") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("mf",
      fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned("mf", fact("2024-01-01", 0 until 4))
    cat.appendPartitionedVersioned("mf", fact("2024-01-02", 4 until 9))
    val walks0 = TableCatalog.carryWalks.get()
    // steady state: appends, DML, publish — all manifest-carried
    cat.appendPartitionedVersioned("mf", fact("2024-01-03", 9 until 12))
    cat.deleteWherePartsVersioned("mf", $"k" === 10L)
    cat.appendToBranch("mf", "wap", fact("2024-01-04", 20 until 22))
    cat.publishBranch("mf", "wap")
    assert(TableCatalog.carryWalks.get() === walks0,
      "a manifested snapshot's carry must never walk the tree")
    val expect = cat.read("mf").orderBy("k").collect().toSeq
    // carried leaves are REAL hard links driven by the manifest
    val v = cat.currentVersion("mf").get
    val carried = leafFiles(cat, "mf", v - 1L, "dt=2024-01-01")
    assert(carried.nonEmpty &&
      carried === leafFiles(cat, "mf", v, "dt=2024-01-01"))
    carried.foreach { n =>
      assert(Files.isSameFile(
        Paths.get(cat.path("mf"), s"_v${v - 1}", "dt=2024-01-01", n),
        Paths.get(cat.path("mf"), s"_v$v", "dt=2024-01-01", n)))
    }
    // a LEGACY snapshot (no manifest — pre-r15 layout) pays exactly
    // one walk, which mints the manifest for every later commit
    Files.delete(Paths.get(cat.path("mf"), s"_v$v", "_leafmanifest.json"))
    cat.appendPartitionedVersioned("mf", fact("2024-01-05", 30 until 32))
    assert(TableCatalog.carryWalks.get() === walks0 + 1L,
      "a manifest-less snapshot must fall back to ONE walk")
    cat.appendPartitionedVersioned("mf", fact("2024-01-06", 40 until 41))
    assert(TableCatalog.carryWalks.get() === walks0 + 1L,
      "the fallback walk must mint the manifest for later commits")
    // content is identical through every carry mode
    assert(cat.read("mf").filter($"dt" <= "2024-01-04")
      .orderBy("k").collect().toSeq === expect)
    assert(cat.read("mf").count() === expect.size + 3L)
    // history file counts ride the manifest, not a walk — and they
    // agree with what is actually on disk
    val onDisk = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(Paths.get(cat.path("mf"), s"_v$v"))
      try st.iterator().asScala.count(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).toLong
      finally st.close()
    }
    assert(cat.history("mf").filter(col("version") === v)
      .select("files").as[Long].head() === onDisk)
  }

  test("lazy spec evolution on a pv table is metadata-only: old " +
      "snapshots keep their layout, new appends land in the new " +
      "generation INSIDE the snapshot, time travel serves the old spec") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.le (k BIGINT, v BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("le",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    def allFiles(v: Long): Set[String] = {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(Paths.get(cat.path("le"), s"_v$v"))
      try st.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => Paths.get(cat.path("le"), s"_v$v").relativize(p).toString)
        .toSet
      finally st.close()
    }
    val v2files = allFiles(2L)
    cat.repartitionTableLazy("le",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    assert(cat.partitionSpecVersioned("le"),
      "lazy evolution must PRESERVE the versioned flag")
    assert(cat.currentVersion("le") === Some(2L),
      "evolution is metadata-only: no snapshot commit")
    assert(allFiles(2L) === v2files, "zero data files move")
    // the next append: carry links old-gen files, the new rows land in
    // _g1 INSIDE the new snapshot, nested under the new spec
    cat.appendPartitionedVersioned("le",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    assert(cat.currentVersion("le") === Some(3L))
    assert(Files.exists(
      Paths.get(cat.path("le"), "_v3", "_g1", "y=2021", "m=3")),
      "post-evolution appends must nest in the snapshot's _g1 subtree")
    assert(allFiles(3L).filterNot(_.startsWith("_g1/")) === v2files,
      "the carry must hard-link the old generation's files by name")
    // reads union the generations (Scala and SQL)
    assert(cat.read("le").count() === 3L)
    assert(cat.read("le").columns.toSeq === Seq("k", "v", "y", "m"))
    assert(spark.sql(s"SELECT k FROM $g.le ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L, 3L))
    assert(spark.sql(s"SELECT k, m FROM $g.le WHERE y = 2021 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((2L, 2), (3L, 3)))
    // time travel reaches the PRE-evolution snapshot under the OLD spec
    assert(cat.readVersion("le", 2L).count() === 2L)
    assert(cat.readVersion("le", 2L).select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 2L))
    assert(spark.sql(s"SELECT count(*) FROM $g.le VERSION AS OF 2")
      .head().getLong(0) === 2L)
    // CDC across the evolution classifies the new-generation rows
    val (ins, del, _, _) = cat.changedRowsBetween("le", 2L, 3L)
    assert(ins.select("k").as[Long].collect().toSeq === Seq(3L))
    assert(del.count() === 0L)
    // streaming/batch exactly-once append still lands (into _g1)
    cat.appendPartitionedVersionedBatch("le",
      Seq((4L, 40L, 2020, 4)).toDF("k", "v", "y", "m"), 0L, "tok")
    cat.appendPartitionedVersionedBatch("le",
      Seq((4L, 40L, 2020, 4)).toDF("k", "v", "y", "m"), 0L, "tok")
    assert(cat.read("le").count() === 4L, "replay must no-op")
    // row-level DELETE crosses the generations as ONE snapshot commit:
    // k=1 lives in gen0's y=2020 leaf, k=3 in _g1's y=2021/m=3 leaf
    val vPre = cat.currentVersion("le").get
    val (aff, _) = cat.deleteWherePartsVersioned("le",
      $"k" === 1L || $"k" === 3L)
    assert(aff.size === 2, s"one affected tuple per generation: $aff")
    assert(cat.currentVersion("le") === Some(vPre + 1L),
      "all generations' rewrites must land as ONE commit")
    assert(cat.read("le").select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L))
    assert(cat.readVersion("le", vPre).count() === 4L,
      "time travel must keep the pre-delete multi-generation state")
    // tuple-addressed verbs route PER GENERATION too (r16): explicit
    // tuples address the CURRENT spec; matching rows purge from every
    // generation under its own layout, all as ONE snapshot commit.
    // k=2 (y=2021, m=2) lives in gen0's y=2021 leaf (m re-derived),
    // k=4 (y=2020, m=4) in _g1's y=2020/m=4 leaf.
    val vd0 = cat.currentVersion("le").get
    cat.dropPartitionsVersioned("le",
      Seq(Seq(Some("2020"), Some("4")), Seq(Some("2021"), Some("2"))))
    assert(cat.currentVersion("le") === Some(vd0 + 1L),
      "cross-generation drop must land as ONE commit")
    assert(cat.read("le").count() === 0L)
    assert(cat.readVersion("le", vd0).count() === 2L,
      "time travel keeps the pre-drop multi-generation state")
    // branch staging + publish on the multi-generation tree: staged
    // rows land in the current generation's subtree, the audit reads
    // base ∪ staged, publish carries the prefixed leaf paths through
    cat.appendToBranch("le", "wap",
      Seq((9L, 90L, 2020, 9)).toDF("k", "v", "y", "m"))
    assert(cat.readBranch("le", "wap").select("k").as[Long].collect()
      .toSeq === Seq(9L))
    assert(spark.sql(s"SELECT k FROM $g.`le@wap`").as[Long]
      .collect().toSeq === Seq(9L),
      "SQL audit of a multi-generation pv branch")
    cat.publishBranch("le", "wap")
    assert(cat.read("le").select("k").as[Long].collect().toSeq ===
      Seq(9L))
    // RESTORE to the pre-evolution snapshot still works (links its tree)
    val vr = cat.restore("le", 2L)
    assert(cat.read("le").count() === 2L)
    assert(cat.readVersion("le", vr).count() === 2L)
  }

  test("CLONE of a lazily-evolved pv table carries BOTH generation " +
      "subtrees and the multi-generation sidecar; the clone reads and " +
      "appends independently") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("src",
      Seq((0L, 0, 0)).toDF("k", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned("src",
      Seq((1L, 2020, 1), (2L, 2021, 2)).toDF("k", "y", "m"))
    cat.repartitionTableLazy("src",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned("src",
      Seq((3L, 2021, 3)).toDF("k", "y", "m"))
    cat.cloneTable("src", "dst")
    assert(cat.specGenerations("dst").size === 2,
      "the multi-generation sidecar must travel with the clone")
    assert(Files.exists(Paths.get(cat.path("dst"), "_v1", "_g1",
      "y=2021", "m=3")), "the clone must carry the _g1 subtree")
    assert(cat.read("dst").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L))
    // independence both ways
    cat.appendPartitionedVersioned("dst",
      Seq((4L, 2022, 4)).toDF("k", "y", "m"))
    assert(cat.read("dst").count() === 4L)
    assert(cat.read("src").count() === 3L)
    cat.deleteWherePartsVersioned("src", $"k" === 3L)
    assert(cat.read("src").count() === 2L)
    assert(cat.read("dst").count() === 4L)
  }

  test("compactGenerationsVersioned collapses a lazily-evolved pv " +
      "table into one tree, re-enables DML/branches, and retires " +
      "pre-compaction time travel by intent") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.cg (k BIGINT, v BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("cg",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy("cg",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned("cg",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    val v = cat.compactGenerationsVersioned("cg")
    assert(v === 4L)
    assert(cat.specGenerations("cg").size === 1,
      "compaction must collapse the sidecar to one generation")
    assert(Files.exists(
      Paths.get(cat.path("cg"), "_v4", "y=2021", "m=3")),
      "compaction must rewrite every row under the CURRENT spec at root")
    assert(!Files.exists(Paths.get(cat.path("cg"), "_v3")),
      "pre-compaction snapshots are retired by intent")
    assert(cat.read("cg").count() === 3L)
    assert(spark.sql(s"SELECT k FROM $g.cg WHERE y = 2021 AND m = 3")
      .as[Long].collect().toSeq === Seq(3L))
    // DML and branches work again on the single-generation snapshot
    cat.deleteWherePartsVersioned("cg", $"k" === 1L)
    assert(cat.read("cg").count() === 2L)
    cat.appendToBranch("cg", "wap",
      Seq((9L, 90L, 2020, 9)).toDF("k", "v", "y", "m"))
    cat.publishBranch("cg", "wap")
    assert(cat.read("cg").count() === 3L)
    // idempotent on a single-generation table
    assert(cat.compactGenerationsVersioned("cg") ===
      cat.currentVersion("cg").get)
    // lazy evolution refuses while a branch is open — the staged tree
    // is laid out under the current spec and would be stranded in the
    // publish-refuses/compact-refuses loop
    cat.appendToBranch("cg", "open",
      Seq((8L, 80L, 2020, 8)).toDF("k", "v", "y", "m"))
    val e = intercept[IllegalArgumentException](
      cat.repartitionTableLazy("cg", Seq(("identity", "y", 0))))
    assert(e.getMessage.contains("open branches"), e.getMessage)
    cat.dropBranch("cg", "open")
    cat.repartitionTableLazy("cg", Seq(("identity", "y", 0)))
    assert(cat.specGenerations("cg").size === 2)
  }
}
