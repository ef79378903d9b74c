package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** Write-audit-publish on PARTITIONED VERSIONED tables (r14 verdict
  * next #1): branches stage whole Hive LEAF TREES, audit against the
  * would-be state, and publish as ONE pv snapshot commit — with the
  * flat protocol's crash windows (pre-commit, commit→consume, foreign
  * commit) closed on leaf-relative paths. */
class PvBranchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("pvbr").toString)

  private def fact(dt: String, ks: Range) =
    ks.map(k => (k.toLong, k.toLong * 10, dt)).toDF("k", "v", "dt")

  private def pvTable(cat: TableCatalog, t: String = "f"): Unit = {
    cat.createPartitionedVersioned(t, fact("x", 0 until 0).schema, Seq("dt"))
    cat.appendPartitionedVersioned(t, fact("2024-01-01", 0 until 5))
  }

  test("pv branch stages two dates invisibly; audit sees the would-be " +
      "state; publish lands them as ONE snapshot commit with CDC") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 14))
    cat.appendToBranch("f", "wap", fact("2024-01-03", 20 until 23))
    assert(cat.read("f").count() === 5L) // isolation
    assert(cat.readBranch("f", "wap").count() === 12L) // audit surface
    assert(cat.readBranch("f", "wap").select("dt").distinct().count() === 3L)
    assert(cat.auditBranch("f", "wap") === 12L)
    // diff: append mode answers with EXACTLY the staged rows
    val d = cat.diffBranch("f", "wap")
    assert(d.count() === 7L)
    assert(d.select("change_type").distinct().as[String]
      .collect().toSeq === Seq("add"))
    val v = cat.publishBranch("f", "wap")
    assert(v === 3L) // v1 create, v2 append, v3 publish — ONE commit
    assert(cat.read("f").count() === 12L)
    assert(cat.branches("f").isEmpty) // consumed
    assert(cat.history("f").filter(col("op") === "PUBLISH").count() === 1L)
    // CDC between the pre-publish and published snapshots = staged rows
    val (ins, del, _, _) = cat.changedRowsBetween("f", 2L, 3L)
    assert(ins.count() === 7L)
    assert(del.count() === 0L)
    // partition pruning still serves the published head
    assert(cat.read("f").filter($"dt" === "2024-01-03").count() === 3L)
  }

  test("published leaves hard-link the branch's staged files (no bytes " +
      "copied); a dropped branch leaves the head byte-identical") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 14))
    // find the staged file under its leaf in the branch tree
    val brDir = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(cat.path("f")))
      try s.iterator().asScala.find(p =>
        p.getFileName.toString.startsWith("_branchdata_wap")).get
      finally s.close()
    }
    val stagedLeaf = brDir.resolve("dt=2024-01-02")
    assert(Files.exists(stagedLeaf), "branch stages a leaf TREE")
    val stagedFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(stagedLeaf)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    assert(stagedFiles.nonEmpty)
    cat.publishBranch("f", "wap")
    val v = cat.currentVersion("f").get
    stagedFiles.foreach { n =>
      val pub = Paths.get(cat.path("f"), s"_v$v", "dt=2024-01-02", n)
      assert(Files.exists(pub), s"published snapshot must hold $n")
    }
    // drop path: stage again, drop, head untouched
    val head = cat.read("f").count()
    cat.appendToBranch("f", "junk", fact("2024-01-09", 0 until 9))
    cat.dropBranch("f", "junk")
    assert(cat.read("f").count() === head)
    assert(cat.currentVersion("f") === Some(v), "drop must not commit")
    assert(cat.branches("f").isEmpty)
  }

  test("pv publish rebases onto a moved head; a same-leaf stage merges " +
      "with rows appended to that leaf meanwhile") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 12))
    // main moves: a foreign append into the SAME leaf the branch stages
    cat.appendPartitionedVersioned("f", fact("2024-01-02", 50 until 53))
    val v = cat.publishBranch("f", "wap")
    assert(cat.read("f").count() === 10L) // 5 + 3 + 2, nothing lost
    assert(cat.readVersion("f", v)
      .filter($"dt" === "2024-01-02").count() === 5L)
  }

  test("pv branch staging enforces CHECK constraints inline and " +
      "re-judges at publish; the declared shape is required") {
    val cat = freshCat()
    pvTable(cat)
    cat.addConstraint("f", "k_pos", "k >= 0")
    val e = intercept[Exception](
      cat.appendToBranch("f", "bad", fact("2024-01-02", -3 until -1)))
    assert(e.getMessage.contains("k_pos"))
    assert(cat.read("f").count() === 5L)
    // wrong shape refuses loudly
    val e2 = intercept[IllegalArgumentException](
      cat.appendToBranch("f", "bad2", Seq((1L, "x")).toDF("k", "dt")))
    assert(e2.getMessage.contains("declared"))
    // a constraint added mid-branch judges the staged rows at publish
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 14))
    cat.addConstraint("f", "k_small", "k < 12")
    val e3 = intercept[Exception](cat.publishBranch("f", "wap"))
    assert(e3.getMessage.contains("k_small"))
    assert(cat.read("f").count() === 5L, "main stayed clean")
  }

  test("pv publish crash windows: pre-commit loses nothing (links, not " +
      "moves); post-commit recovery consumes instead of re-publishing") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranchBatch("f", "wap", 4L,
      fact("2024-01-02", 10 until 12), token = "tok")
    val e1 = intercept[RuntimeException] {
      cat.publishBranchHooked("f", "wap",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ())
    }
    assert(e1.getMessage === "crash-pre-commit")
    assert(cat.read("f").count() === 5L) // nothing landed
    assert(cat.readBranch("f", "wap").count() === 7L) // nothing lost
    cat.publishBranch("f", "wap")
    assert(cat.read("f").count() === 7L)
    assert(cat.branches("f").isEmpty)
    // post-commit crash: recovery must consume, never double
    cat.appendToBranchBatch("f", "wap", 7L,
      fact("2024-01-03", 20 until 21), token = "tok")
    val e2 = intercept[RuntimeException] {
      cat.publishBranchHooked("f", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit"))
    }
    assert(e2.getMessage === "crash-post-commit")
    assert(cat.read("f").count() === 8L) // the commit DID land
    assert(cat.branches("f").keySet === Set("wap")) // consume never ran
    cat.publishBranch("f", "wap")
    assert(cat.read("f").count() === 8L)
    assert(cat.read("f").distinct().count() === 8L, "recovery re-published")
    assert(cat.branches("f").isEmpty)
    assert(cat.publishedBranchBatch("f", "wap", "tok") === Some(7L))
  }

  test("a foreign pv commit in the pre-commit crash window never spoofs " +
      "'committed': provenance-checked recovery publishes for real") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranchBatch("f", "wap", 4L,
      fact("2024-01-02", 10 until 12), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("f", "wap",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ())
    }
    assert(e.getMessage === "crash-pre-commit")
    // the writer lease expires; an unrelated pv append takes `expect`
    cat.appendPartitionedVersioned("f", fact("2024-01-04", 90 until 91))
    assert(cat.read("f").count() === 6L) // staged rows still off main
    cat.publishBranch("f", "wap") // provenance: pre-commit → publish
    assert(cat.read("f").count() === 8L)
    assert(cat.read("f").distinct().count() === 8L, "rows doubled")
    assert(cat.branches("f").isEmpty)
    assert(cat.publishedBranchBatch("f", "wap", "tok") === Some(4L))
  }

  test("a batch replayed into the commit→record crash window is swept " +
      "by pv recovery on LEAF-RELATIVE paths; a new post-crash batch " +
      "survives and lands once") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranchBatch("f", "wap", 4L,
      fact("2024-01-02", 10 until 12), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("f", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit"))
    }
    assert(e.getMessage === "crash-post-commit")
    assert(cat.read("f").count() === 7L) // the commit landed
    // watermark never recorded → a restarted stream re-stages batch 4
    // under fresh UUIDs, then a genuinely new batch 5 stages after it
    assert(cat.publishedBranchBatch("f", "wap", "tok") === None)
    cat.appendToBranchBatch("f", "wap", 4L,
      fact("2024-01-02", 10 until 12), token = "tok")
    cat.appendToBranchBatch("f", "wap", 5L,
      fact("2024-01-03", 30 until 31), token = "tok")
    cat.publishBranch("f", "wap")
    assert(cat.read("f").count() === 8L,
      "the replayed batch double-published or batch 5 was lost")
    assert(cat.read("f").distinct().count() === 8L)
    assert(cat.publishedBranchBatch("f", "wap", "tok") === Some(5L))
    assert(cat.branches("f").isEmpty)
  }

  test("a pv stage landing in the commit-to-consume crash window " +
      "survives the selective consume and lands as the next commit") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranchBatch("f", "wap", 1L,
      fact("2024-01-02", 10 until 12), token = "tok")
    val e = intercept[RuntimeException] {
      cat.publishBranchHooked("f", "wap",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("boom"))
    }
    assert(e.getMessage === "boom")
    // a NEW batch stages into the still-open branch before recovery
    cat.appendToBranchBatch("f", "wap", 2L,
      fact("2024-01-05", 40 until 42), token = "tok")
    cat.publishBranch("f", "wap") // recovery consumes batch 1, lands 2
    assert(cat.read("f").count() === 9L) // 5 + 2 + 2
    assert(cat.read("f").distinct().count() === 9L)
    assert(cat.branches("f").isEmpty)
  }

  test("pv branch replays are exactly-once: re-staging a batch id " +
      "sweeps its previous landing across leaves") {
    val cat = freshCat()
    pvTable(cat)
    // batch 3 lands rows in TWO leaves, then replays with different rows
    cat.appendToBranchBatch("f", "wap", 3L,
      fact("2024-01-02", 10 until 12)
        .unionByName(fact("2024-01-03", 20 until 22)), token = "tok")
    cat.appendToBranchBatch("f", "wap", 3L,
      fact("2024-01-02", 10 until 12), token = "tok") // replay, fewer rows
    assert(cat.readBranch("f", "wap").count() === 7L,
      "the replayed batch must sweep its prior landing in EVERY leaf")
    cat.publishBranch("f", "wap")
    assert(cat.read("f").count() === 7L)
  }

  test("the SQL WAP loop runs on a pv fact: INSERT INTO t@branch " +
      "stages a leaf tree, SELECT audits base ∪ staged with the " +
      "declared schema, CALL publish_branch commits one snapshot") {
    val root = Files.createTempDirectory("pvbrsql").toString
    val g = "gpvbr1"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    spark.sql(s"CREATE TABLE $g.f (k BIGINT, v BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.f VALUES (1, 10, '2024-01-01')")
    // stage TWO dates from SQL — the branch is created on first write
    spark.sql(s"INSERT INTO $g.`f@wap` VALUES (2, 20, '2024-01-02'), " +
      "(3, 30, '2024-01-02')")
    spark.sql(s"INSERT INTO $g.`f@wap` VALUES (4, 40, '2024-01-03')")
    assert(spark.sql(s"SELECT count(*) FROM $g.f").head().getLong(0) === 1L,
      "staged rows leaked onto main")
    // the audit surface from SQL: declared order, base ∪ staged
    val audit = spark.sql(s"SELECT k, v, dt FROM $g.`f@wap` ORDER BY k")
    assert(audit.columns.toSeq === Seq("k", "v", "dt"))
    assert(audit.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 10L, "2024-01-01"), (2L, 20L, "2024-01-02"),
        (3L, 30L, "2024-01-02"), (4L, 40L, "2024-01-03")))
    assert(spark.sql(s"CALL $g.system.publish_branch('f', 'wap')")
      .head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT count(*) FROM $g.f").head().getLong(0) === 4L)
    assert(cat.branches("f").isEmpty)
    // leaf pruning serves the published head
    assert(spark.sql(
      s"SELECT k FROM $g.f WHERE dt = '2024-01-03'").as[Long]
      .collect().toSeq === Seq(4L))
    // a read of an unborn branch refuses loudly (never main's data)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $g.`f@typo`").collect())
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // OVERWRITE of an APPEND-mode pv branch refuses (one branch
    // stages one way)
    spark.sql(s"INSERT INTO $g.`f@wap2` VALUES (9, 90, '2024-01-09')")
    val e2 = intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $g.`f@wap2` VALUES (8, 80, '2024-01-08')"))
    assert(e2.getMessage.contains("append-mode"), e2.getMessage)
    cat.dropBranch("f", "wap2")
    // ...but on a FRESH branch, INSERT OVERWRITE is the SQL face of
    // replace-mode WAP (r16): dynamic-partition-overwrite under audit
    spark.sql(s"INSERT OVERWRITE $g.`f@fix` VALUES (7, 70, '2024-01-01')")
    assert(spark.sql(s"SELECT k FROM $g.`f@fix` " +
      "WHERE dt = '2024-01-01'").as[Long].collect().toSeq === Seq(7L),
      "the staged partition reads as replaced on the branch")
    assert(spark.sql(s"SELECT count(*) FROM $g.f WHERE dt = '2024-01-01'")
      .head().getLong(0) === 1L, "main untouched until publish")
    spark.sql(s"CALL $g.system.publish_branch('f', 'fix')")
    assert(spark.sql(s"SELECT k FROM $g.f WHERE dt = '2024-01-01'")
      .as[Long].collect().toSeq === Seq(7L),
      "publish swaps the claimed partition")
    assert(cat.branches("f").isEmpty)
  }

  test("SQL pv branch reads serve a TRANSFORM spec's hidden columns " +
      "correctly: discovery resolves them, SELECT * never shows them") {
    val root = Files.createTempDirectory("pvbrsql2").toString
    val g = "gpvbr2"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    spark.sql(s"CREATE TABLE $g.tf (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.tf VALUES (1, timestamp'2024-03-01 10:00:00')")
    spark.sql(s"INSERT INTO $g.`tf@wap` VALUES " +
      "(2, timestamp'2024-03-02 11:00:00')")
    val audit = spark.sql(s"SELECT * FROM $g.`tf@wap` ORDER BY k")
    assert(audit.columns.toSeq === Seq("k", "ts"),
      "the hidden ts_day transform column must not leak into SELECT *")
    assert(audit.count() === 2L)
    spark.sql(s"CALL $g.system.publish_branch('tf', 'wap')")
    assert(spark.sql(s"SELECT count(*) FROM $g.tf").head().getLong(0) === 2L)
    assert(cat.read("tf").count() === 2L)
  }

  test("NULL partition values ride the whole pv WAP and batch-append " +
      "loop: staged into the NULL leaf, audited, published, replayed " +
      "exactly once, and purgeable") {
    val cat = freshCat()
    pvTable(cat)
    val withNull = Seq((100L, 1000L, null.asInstanceOf[String]),
      (101L, 1010L, "2024-01-02")).toDF("k", "v", "dt")
    cat.appendToBranchBatch("f", "wap", 0L, withNull, token = "tok")
    assert(cat.readBranch("f", "wap").filter($"dt".isNull).count() === 1L,
      "the audit surface must serve the NULL-partition row")
    cat.publishBranch("f", "wap")
    assert(cat.read("f").filter($"dt".isNull).select("k").as[Long]
      .head() === 100L)
    assert(cat.read("f").count() === 7L)
    // exactly-once batch append with a NULL partition value
    cat.appendPartitionedVersionedBatch("f", withNull
      .withColumn("k", $"k" + 100L), 5L, "tok")
    cat.appendPartitionedVersionedBatch("f", withNull
      .withColumn("k", $"k" + 100L), 5L, "tok") // replay
    assert(cat.read("f").filter($"dt".isNull).count() === 2L,
      "the replayed NULL-leaf batch must land exactly once")
    // the NULL leaf purges like any other (Option-typed tuple routing)
    val (aff, gone) = cat.deleteWherePartsVersioned("f", $"dt".isNull)
    assert(aff === Seq(Seq(None)) && gone === Seq(Seq(None)))
    assert(cat.read("f").filter($"dt".isNull).count() === 0L)
    assert(cat.read("f").count() === 7L)
  }

  test("pv branches refuse the flat repair verbs and SQL loudly " +
      "(partition-scoped replace has its own verb)") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 12))
    val e1 = intercept[IllegalArgumentException](
      cat.replaceBranch("f", "wap", fact("2024-01-02", 0 until 1)))
    assert(e1.getMessage.contains("append-mode"))
    val e2 = intercept[IllegalArgumentException](
      cat.mergeBranchInto("f", "wap", fact("2024-01-02", 0 until 1),
        Seq("k")))
    assert(e2.getMessage.contains("append-mode"))
    val e3 = intercept[IllegalArgumentException](
      cat.deleteFromBranch("f", "wap", col("k") === 10L))
    assert(e3.getMessage.contains("append-mode"))
    // mergeSchema staging refuses (pv evolution happens on the table)
    val e4 = intercept[IllegalArgumentException](
      cat.appendToBranch("f", "wap",
        fact("2024-01-02", 0 until 1).withColumn("extra", lit(1L)),
        mergeSchema = true))
    assert(e4.getMessage.contains("mergeSchema"))
    cat.dropBranch("f", "wap")
  }

  // ---------------- REPLACE-mode pv branches (r16 verdict next #3):
  // partition REWRITE under audit — the GDPR-delete / repriced-
  // backfill / compaction-under-audit loop WAP could not express.

  test("replace-mode pv branch: a claimed partition reads REPLACED on " +
      "the branch (Scala and SQL, base leaves pruned), main untouched; " +
      "publish swaps the claimed leaves as ONE commit with CDC") {
    val root = Files.createTempDirectory("pvbrrp").toString
    val g = "gpvrp1"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    pvTable(cat)                                   // 2024-01-01: k=0..4
    cat.appendPartitionedVersioned("f", fact("2024-01-02", 10 until 14))
    // GDPR-delete under audit: rewrite 2024-01-01 WITHOUT k<2
    val base = cat.replacePartitionsOnBranch("f", "gdpr",
      fact("2024-01-01", 2 until 5))
    assert(base === cat.currentVersion("f").get)
    assert(cat.read("f").count() === 9L, "main untouched until publish")
    val br = cat.readBranch("f", "gdpr")
    assert(br.count() === 7L)
    assert(br.filter($"dt" === "2024-01-01").select("k").as[Long]
      .collect().sorted.toSeq === Seq(2L, 3L, 4L),
      "the claimed partition reads as its staged replacement")
    assert(br.filter($"dt" === "2024-01-02").count() === 4L,
      "unclaimed partitions read from base")
    // SQL audit agrees, and the base's claimed leaf is PRUNED from the
    // plan (the exclusion is a partition filter, not a row filter)
    val sqlBr = spark.sql(s"SELECT k FROM $g.`f@gdpr` " +
      "WHERE dt = '2024-01-01' ORDER BY k")
    assert(sqlBr.as[Long].collect().toSeq === Seq(2L, 3L, 4L))
    val audit = spark.sql(s"SELECT count(*) FROM $g.`f@gdpr`")
    assert(audit.head().getLong(0) === 7L)
    val baseLeafFiles = spark.sql(s"SELECT * FROM $g.`f@gdpr`")
      .inputFiles.filter(_.contains(s"_v$base/dt=2024-01-01"))
    assert(baseLeafFiles.isEmpty,
      "the base's claimed leaf must not be scanned on the branch")
    // diff = removes of the excised rows (k=0,1)
    val d = cat.diffBranch("f", "gdpr")
    assert(d.filter($"change_type" === "remove").select("k").as[Long]
      .collect().sorted.toSeq === Seq(0L, 1L))
    assert(d.filter($"change_type" === "add").count() === 0L)
    // repair loop: re-staging the claimed partition SWAPS the staging
    cat.replacePartitionsOnBranch("f", "gdpr",
      fact("2024-01-01", 3 until 5))
    assert(cat.readBranch("f", "gdpr").count() === 6L)
    // publish: one commit; the claimed leaf swaps; CDC classifies
    val vPre = cat.currentVersion("f").get
    val v = cat.publishBranch("f", "gdpr")
    assert(v === vPre + 1L)
    assert(cat.read("f").filter($"dt" === "2024-01-01").select("k")
      .as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    assert(cat.read("f").count() === 6L)
    assert(cat.branches("f").isEmpty, "publish consumes the branch")
    val (ins, del, _, _) = cat.changedRowsBetween("f", vPre, v)
    assert(del.select("k").as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 3L, 4L),
      "CDC sees the claimed leaf's old files removed")
    assert(ins.select("k").as[Long].collect().sorted.toSeq ===
      Seq(3L, 4L), "…and the staged replacement added")
    // time travel keeps the pre-publish state
    assert(cat.readVersion("f", vPre).count() === 9L)
  }

  test("replace-mode pv branch: a claim with no staged rows is a " +
      "partition DROP under audit; publish commits the drop") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendPartitionedVersioned("f", fact("2024-01-02", 10 until 13))
    cat.replacePartitionsOnBranch("f", "ret",
      fact("x", 0 until 0), // zero staged rows
      dropParts = Seq(Seq(Some("2024-01-02"))))
    assert(cat.readBranch("f", "ret").count() === 5L,
      "the dropped partition must vanish from the branch view")
    assert(cat.read("f").count() === 8L, "main untouched")
    val v = cat.publishBranch("f", "ret")
    assert(cat.read("f").count() === 5L)
    assert(cat.read("f").filter($"dt" === "2024-01-02").count() === 0L)
    assert(cat.readVersion("f", v - 1L).count() === 8L)
    assert(cat.branches("f").isEmpty)
  }

  test("replace-mode pv publish crash windows: pre-commit loses " +
      "nothing; post-commit recovery consumes without re-publishing") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendPartitionedVersioned("f", fact("2024-01-02", 10 until 13))
    cat.replacePartitionsOnBranch("f", "bf",
      fact("2024-01-02", 20 until 22))
    // pre-commit crash: the intent is written, the commit never lands
    intercept[RuntimeException](
      cat.publishBranchHooked("f", "bf",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ()))
    assert(cat.read("f").count() === 8L, "nothing published")
    assert(cat.readBranch("f", "bf").count() === 7L,
      "the staged replacement survives the crash")
    // retry publishes exactly once
    val v = cat.publishBranch("f", "bf")
    assert(cat.read("f").filter($"dt" === "2024-01-02").select("k")
      .as[Long].collect().sorted.toSeq === Seq(20L, 21L))
    // post-commit crash on a SECOND replace publish: recovery folds
    // and consumes, never doubles
    cat.replacePartitionsOnBranch("f", "bf2",
      fact("2024-01-02", 30 until 32))
    intercept[RuntimeException](
      cat.publishBranchHooked("f", "bf2",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit")))
    assert(cat.read("f").filter($"dt" === "2024-01-02").select("k")
      .as[Long].collect().sorted.toSeq === Seq(30L, 31L),
      "the commit landed before the crash")
    val v2 = cat.currentVersion("f").get
    cat.publishBranch("f", "bf2") // recovery path: consume, no re-publish
    assert(cat.currentVersion("f") === Some(v2),
      "recovery must not publish a second commit")
    assert(cat.read("f").filter($"dt" === "2024-01-02").count() === 2L,
      "rows must not double")
    assert(cat.branches("f").isEmpty)
    assert(v2 === v + 1L)
  }

  test("replace-mode WAP on a TRANSFORM spec: claims address the " +
      "hidden generated partition tuples, the SQL audit prunes the " +
      "claimed base leaves by derived value, publish swaps them") {
    val root = Files.createTempDirectory("pvbrtr").toString
    val g = "gpvtr1"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    val rows = Seq(
      (1L, java.sql.Date.valueOf("2024-01-10")),
      (2L, java.sql.Date.valueOf("2024-01-20")),
      (3L, java.sql.Date.valueOf("2024-02-05"))).toDF("k", "d")
    cat.createPartitionedVersioned("t", rows.schema,
      Seq(("months", "d", 0)))
    cat.appendPartitionedVersioned("t", rows)
    // rewrite January (drop k=1, keep k=2) under audit — the claim is
    // the HIDDEN d_month tuple, derived from the staged rows
    cat.replacePartitionsOnBranch("t", "jan",
      Seq((2L, java.sql.Date.valueOf("2024-01-20"))).toDF("k", "d"))
    val br = cat.readBranch("t", "jan")
    assert(br.select("k").as[Long].collect().sorted.toSeq === Seq(2L, 3L),
      "the claimed month reads as its staged replacement")
    assert(spark.sql(s"SELECT k FROM $g.`t@jan` ORDER BY k").as[Long]
      .collect().toSeq === Seq(2L, 3L),
      "the SQL audit agrees on the transform-claimed view")
    assert(cat.read("t").count() === 3L, "main untouched")
    val v = cat.publishBranch("t", "jan")
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L))
    assert(cat.readVersion("t", v - 1L).count() === 3L)
  }

  test("replace-mode and append-mode stagings refuse each other's " +
      "branches; claims validate arity") {
    val cat = freshCat()
    pvTable(cat)
    cat.appendToBranch("f", "wap", fact("2024-01-02", 10 until 12))
    val e1 = intercept[IllegalArgumentException](
      cat.replacePartitionsOnBranch("f", "wap",
        fact("2024-01-01", 0 until 1)))
    assert(e1.getMessage.contains("append-mode"), e1.getMessage)
    cat.replacePartitionsOnBranch("f", "fix", fact("2024-01-01", 0 until 2))
    val e2 = intercept[IllegalArgumentException](
      cat.appendToBranch("f", "fix", fact("2024-01-03", 0 until 1)))
    assert(e2.getMessage.contains("replace"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      cat.replacePartitionsOnBranch("f", "fix2", fact("x", 0 until 0),
        dropParts = Seq(Seq(Some("a"), Some("b")))))
    assert(e3.getMessage.contains("1 values"), e3.getMessage)
    cat.dropBranch("f", "wap"); cat.dropBranch("f", "fix")
  }

  // ---------------- replace-mode WAP on a LAZILY-EVOLVED table (r17
  // verdict next #1 — the last refusal in the pv verb matrix): claims
  // address CURRENT-spec tuples; matching rows inside OLDER
  // generations' foreign leaves excise by re-derived value on the
  // branch read and rewrite as survivors at publish, one snapshot.

  /** gen0 (y layout): k=1 → y2020/m1, k=2 → y2021/m2, k=5 → y2021/m9
    * (two rows in the y=2021 leaf, so a claim on (2021,2) leaves a
    * SURVIVOR); `_g1` ((y,m) layout): k=3 → y2021/m3, k=4 → y2020/m4. */
  private def twoGenTable(cat: TableCatalog, t: String): Unit = {
    cat.createPartitionedVersioned(t,
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned(t,
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2), (5L, 50L, 2021, 9))
        .toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy(t,
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned(t,
      Seq((3L, 30L, 2021, 3), (4L, 40L, 2020, 4)).toDF("k", "v", "y", "m"))
  }

  test("replace-mode WAP on a 2-generation table: claims excise " +
      "old-generation rows by re-derived value on the branch read " +
      "(Scala and SQL), publish pairs the current-gen leaf swap with " +
      "the older generation's survivor rewrite as ONE commit") {
    val root = Files.createTempDirectory("pvbrmg").toString
    val g = "gpvmg1"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    twoGenTable(cat, "t")
    val v0 = cat.currentVersion("t").get
    // claim (2021,2): replaces gen0's k=2 with k=20, survivor k=5
    // stays; claim (2020,4): pure partition DROP of _g1's y=2020/m=4
    cat.replacePartitionsOnBranch("t", "rw",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"),
      dropParts = Seq(Seq(Some("2020"), Some("4"))))
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L), "main untouched by staging")
    assert(cat.readBranch("t", "rw").select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 3L, 5L, 20L),
      "branch view = base minus claim-matching rows (in BOTH " +
        "generations) plus staged")
    // the SQL audit agrees — including a projection that omits the
    // claim columns, so the older-gen leg must read them for its
    // row-level exclusion and drop them after
    assert(spark.sql(s"SELECT k FROM $g.`t@rw` ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 3L, 5L, 20L))
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@rw`").head().getLong(0)
      === 4L)
    // (plan-level pruning evidence lives in MultiGenPlanSpec, which
    // can reach the composite scan's private partition types)
    // diff: the excised rows remove, the staged row adds
    val d = cat.diffBranch("t", "rw")
    assert(d.filter($"change_type" === "remove").select("k").as[Long]
      .collect().sorted.toSeq === Seq(2L, 4L))
    assert(d.filter($"change_type" === "add").select("k").as[Long]
      .collect().toSeq === Seq(20L))
    // publish: ONE snapshot commit carries the survivor rewrite, the
    // current-gen swap and the staged adoption
    val v = cat.publishBranch("t", "rw")
    assert(v === v0 + 1L, "one commit")
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 5L, 20L))
    assert(cat.branches("t").isEmpty, "publish consumes the branch")
    // the survivor rewrite landed under gen0's OWN layout; the staged
    // replacement under the current generation's
    val snap = Paths.get(cat.path("t"), s"_v$v")
    assert(Files.exists(snap.resolve("y=2021")),
      "gen0's y=2021 leaf must exist (survivor k=5)")
    assert(!Files.exists(snap.resolve("_g1").resolve("y=2020")
      .resolve("m=4")), "the dropped current-gen leaf must not carry")
    assert(Files.exists(snap.resolve("_g1").resolve("y=2021")
      .resolve("m=2")), "the staged replacement lands in _g1")
    import org.apache.spark.sql.types.{StructType, StructField, LongType, IntegerType}
    val gen0Schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType), StructField("m", IntegerType)))
    val gen0y2021 = spark.read.schema(gen0Schema)
      .parquet(snap.resolve("y=2021").toString)
    assert(gen0y2021.select("k").as[Long].collect().toSeq === Seq(5L),
      "gen0's y=2021 leaf rewrote to exactly the survivor")
    // time travel keeps the pre-publish multi-gen state
    assert(cat.readVersion("t", v0).select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("multi-gen replace publish staleness races (r17 adversarial " +
      "probes): a concurrent APPEND between the survivor staging and " +
      "the lock forces a re-derive (no silent drop, no resurrection); " +
      "a concurrent RE-STAGE that changes the claim set likewise") {
    // race 1: the head moves — the appended row must survive publish
    val cat = freshCat()
    twoGenTable(cat, "t")
    cat.replacePartitionsOnBranch("t", "rw",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"))
    var fired = false
    cat.publishBranchHooked("t", "rw", () => (), () => (),
      beforeLock = () => if (!fired) {
        fired = true
        // lands in _g1 (current gen) — a head the staged survivors
        // don't know about; committing against it would drop this row
        cat.appendPartitionedVersioned("t",
          Seq((7L, 70L, 2022, 7)).toDF("k", "v", "y", "m"))
      })
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 4L, 5L, 7L, 20L),
      "the concurrent append must survive the replace publish")
    // race 2: a re-stage changes the CLAIM SET mid-publish — the
    // final state must honor the grown claims, not the staged ones
    val cat2 = freshCat()
    twoGenTable(cat2, "t")
    cat2.replacePartitionsOnBranch("t", "rw",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"))
    var fired2 = false
    cat2.publishBranchHooked("t", "rw", () => (), () => (),
      beforeLock = () => if (!fired2) {
        fired2 = true
        // adds claim (2020,1): gen0's k=1 must ALSO excise — a publish
        // that kept the stale survivor staging would resurrect it
        cat2.replacePartitionsOnBranch("t", "rw",
          Seq((30L, 300L, 2020, 1)).toDF("k", "v", "y", "m"))
      })
    assert(cat2.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(3L, 4L, 5L, 20L, 30L),
      "the grown claim set must excise k=1 and land k=30 — a stale " +
        "survivor staging would have resurrected k=1")
    assert(cat2.branches("t").isEmpty)
  }

  test("multi-gen replace publish crash windows: pre-commit loses " +
      "nothing; post-commit recovery consumes without re-running the " +
      "survivor rewrite") {
    val cat = freshCat()
    twoGenTable(cat, "t")
    cat.replacePartitionsOnBranch("t", "rw",
      Seq((20L, 200L, 2021, 2)).toDF("k", "v", "y", "m"))
    // pre-commit crash: the intent and the survivor scratch are
    // written, the commit never lands — nothing changes, the staging
    // survives, no scratch leaks into the table root's data view
    intercept[RuntimeException](
      cat.publishBranchHooked("t", "rw",
        afterPend = () => throw new RuntimeException("crash-pre-commit"),
        afterCommit = () => ()))
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L), "nothing published")
    assert(cat.readBranch("t", "rw").select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 3L, 4L, 5L, 20L),
      "the staged replacement survives the crash")
    val v = cat.publishBranch("t", "rw")
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 4L, 5L, 20L), "retry publishes exactly once")
    // post-commit crash on a second multi-gen replace publish:
    // recovery folds and consumes, the survivor rewrite never doubles
    cat.replacePartitionsOnBranch("t", "rw2",
      Seq((30L, 300L, 2020, 1)).toDF("k", "v", "y", "m"))
    intercept[RuntimeException](
      cat.publishBranchHooked("t", "rw2",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash-post-commit")))
    assert(cat.read("t").select("k").as[Long].collect().sorted.toSeq ===
      Seq(3L, 4L, 5L, 20L, 30L), "the commit landed before the crash")
    val v2 = cat.currentVersion("t").get
    cat.publishBranch("t", "rw2") // recovery: consume, no re-publish
    assert(cat.currentVersion("t") === Some(v2),
      "recovery must not publish a second commit")
    assert(cat.read("t").filter($"k" === 5L).count() === 1L,
      "the survivor row must not double")
    assert(cat.read("t").filter($"k" === 30L).count() === 1L,
      "the staged row must not double")
    assert(cat.branches("t").isEmpty)
    assert(v2 === v + 1L)
  }
}
