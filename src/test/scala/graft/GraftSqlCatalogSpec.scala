package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** The DSv2 SQL surface over the versioned catalog: snapshot + time
  * travel resolution, plain-table fallback, bare-scan DV refusal, and
  * the read-only contract. */
class GraftSqlCatalogSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("sqlcat").toString
    seq += 1
    val name = s"gspec$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("snapshot + VERSION AS OF resolve through plain SQL") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    cat.replaceAtomic("d", Seq((1L, "a2"), (3L, "c")).toDF("k", "s"))
    assert(spark.sql(s"SELECT k, s FROM $g.d ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a2"), (3L, "c")))
    assert(spark.sql(s"SELECT k, s FROM $g.d VERSION AS OF $v1 ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // filters push into the stock parquet scan (the plugin only
    // resolves the directory; Spark plans the read)
    val plan = spark.sql(s"SELECT k FROM $g.d WHERE k = 3")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)"),
      s"filter not pushed:\n$plan")
  }

  test("plain tables read; DV-carrying tables refuse; listTables lists") {
    val (cat, g) = freshSqlCat()
    cat.append("p", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"))
    assert(spark.sql(s"SELECT sum(v) FROM $g.p").as[Long].head() === 60L)
    cat.deleteVectorize("p", col("k") === 1, autoFoldAt = 2d)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $g.p").collect())
    assert(e.getMessage.contains("deletion vectors"))
    cat.applyDeleteVectors("p")
    assert(spark.sql(s"SELECT sum(v) FROM $g.p").as[Long].head() === 50L)
    assert(spark.sql(s"SHOW TABLES IN $g").collect().map(_.getString(1)).toSet
      === Set("p"))
  }

  test("RENAME stays refused; unknown tables/versions are loud") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v"))
    val w = intercept[Exception](spark.sql(s"ALTER TABLE $g.d RENAME TO $g.e"))
    assert(w.getMessage.toLowerCase.contains("read-only") ||
      w.getMessage.toLowerCase.contains("unsupported"))
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.nope").collect()).getMessage.nonEmpty)
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.d VERSION AS OF 99").collect())
      .getMessage.nonEmpty)
  }

  test("CALL g.system.* runs the maintenance lifecycle from plain SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v").repartition(8))
    spark.sql(s"INSERT INTO $g.t VALUES (1000, 1000)")
    // DESCRIBE HISTORY as rows
    val hist = spark.sql(s"CALL $g.system.describe_history('t')")
    assert(hist.columns.toSeq ===
      Seq("version", "ts_millis", "op", "files", "bytes"))
    assert(hist.select("op").as[String].collect().toSeq ===
      Seq("REPLACE", "APPEND"))
    // OPTIMIZE compacts to one file (the default 128 MB target)
    assert(spark.sql(s"CALL $g.system.optimize('t')")
      .as[Long].head() === 1L)
    // RESTORE re-commits the appended version's content
    spark.sql(s"CALL $g.system.restore('t', 2)")
    assert(cat.read("t").count() === 101L)
    assert(spark.sql(s"CALL $g.system.describe_history('t')")
      .select("op").as[String].collect().last === "RESTORE")
    // VACUUM returns the audit shape (nothing crashed here: empty)
    val vac = spark.sql(s"CALL $g.system.vacuum('t', 0)")
    assert(vac.columns.toSeq === Seq("category", "files", "bytes"))
    // unknown procedures and bad args are loud
    assertThrows[Exception](spark.sql(s"CALL $g.system.nope('t')"))
    assertThrows[Exception](
      spark.sql(s"CALL $g.system.restore('t', 99)").collect())
  }

  test("CALL g.system audit_branch/publish_branch/drop_branch drive the WAP loop") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 10).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    cat.addConstraint("t", "k_pos", "k > 0")
    cat.appendToBranch("t", "load", Seq((100L, 100L)).toDF("k", "v"))
    // audit from SQL: the would-be row count
    assert(spark.sql(s"CALL $g.system.audit_branch('t', 'load')")
      .as[Long].head() === 11L)
    // main is still unaware
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 10L)
    assert(spark.sql(s"CALL $g.system.publish_branch('t', 'load')")
      .as[Long].head() === 2L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 11L)
    // a second branch, abandoned from SQL
    cat.appendToBranch("t", "bad", Seq((200L, 200L)).toDF("k", "v"))
    spark.sql(s"CALL $g.system.drop_branch('t', 'bad')").collect()
    assert(cat.branches("t").isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 11L)
  }

  test("SELECT FROM t@branch audits the would-be state read-only; CALL clone") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 10).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    cat.appendToBranch("t", "wap", Seq((100L, 100L)).toDF("k", "v"))
    // the branch identifier reads base ∪ staged; the bare table doesn't
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@wap`").as[Long].head() === 11L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 10L)
    assert(spark.sql(s"SELECT max(k) FROM $g.`t@wap`").as[Long].head() === 100L)
    // INSERT INTO the branch identifier STAGES (r11 verdict #3): the
    // SQL half of write-audit-publish — main remains unaware
    spark.sql(s"INSERT INTO $g.`t@wap` VALUES (7, 700)")
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@wap`").as[Long].head() === 12L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 10L)
    // row-level SQL on the branch fixes its would-be state in place
    // (r12 verdict #2): main stays unaware until publish
    spark.sql(s"DELETE FROM $g.`t@wap` WHERE k = 7")
    // BOTH k=7 rows go — the staged (7,700) and the base (7,7): the
    // statement edits the would-be table, not just the staged delta
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@wap`").as[Long].head() === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@wap` WHERE k = 7")
      .as[Long].head() === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t WHERE k = 7")
      .as[Long].head() === 1L)
    // SELECT of an un-created branch is LOUD (ADVICE r12 low): a typoed
    // branch name must never silently audit main-table data
    val eFresh = intercept[Exception](
      spark.sql(s"SELECT count(*) FROM $g.`t@fresh`").as[Long].head())
    assert(eFresh.getMessage.contains("does not exist"), eFresh.getMessage)
    assert(cat.branches("t").keySet === Set("wap"))
    // ...but a branch on an unknown TABLE is loud
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $g.`nosuch@b`").collect())
    // zero-copy clone from SQL, then the clone is queryable immediately
    assert(spark.sql(s"CALL $g.system.clone('t', 't2')").as[Long].head() === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t2").as[Long].head() === 10L)
  }

  test("the whole WAP loop runs in SQL: INSERT INTO t@branch stages, " +
      "SELECT audits, INSERT OVERWRITE fixes, CALL publishes + expires") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    // stage: the branch is born on the first SQL INSERT
    spark.sql(s"INSERT INTO $g.`t@load` VALUES (10, 500), (11, 11)")
    assert(cat.branches("t").keySet === Set("load"))
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 5L)
    // audit in SQL: the bad row shows only on the branch surface
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@load` WHERE v >= 100")
      .as[Long].head() === 1L)
    // fix in SQL: OVERWRITE the branch with the corrected would-be state
    spark.sql(s"INSERT OVERWRITE $g.`t@load` " +
      s"SELECT k, CASE WHEN v >= 100 THEN 99 ELSE v END AS v FROM $g.`t@load`")
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@load` WHERE v >= 100")
      .as[Long].head() === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 5L)
    // publish: the fixed rewrite lands as one commit
    spark.sql(s"CALL $g.system.publish_branch('t', 'load')").collect()
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 7L)
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 10").as[Long].head() === 99L)
    // expire: the leak-stopper is callable from SQL too
    cat.appendToBranch("t", "stale", Seq((50L, 50L)).toDF("k", "v"))
    Thread.sleep(10)
    val dropped = spark.sql(
      s"CALL $g.system.expire_branches('t', 5)").collect()
    assert(dropped.map(_.getString(0)).toSeq === Seq("stale"))
    assert(dropped.forall(_.getLong(1) > 0L))
    assert(cat.branches("t").isEmpty)
  }

  test("CALL describe_detail summarizes; restore_timestamp undoes since an instant") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 7).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.addConstraint("t", "k_pos", "k > 0")
    cat.tag("t", "gold")
    cat.appendToBranch("t", "wap", Seq((9L, 9L)).toDF("k", "v"))
    val d = spark.sql(s"CALL $g.system.describe_detail('t')").head()
    assert(d.getLong(0) === 1L) // version
    assert(d.getLong(1) === -1L) // rows unknown — no ANALYZE ran
    assert(d.getLong(2) >= 1L && d.getLong(3) > 0L) // files, bytes
    assert(d.getString(4) === "wap" && d.getString(5) === "gold")
    assert(d.getString(6) === "k_pos")
    assert(d.getString(7).split(",").toSeq === Seq("k", "v"))
    cat.dropBranch("t", "wap")
    // restore to the instant AFTER v1's commit: two bad appends later,
    // the table comes back to v1's content as a NEW commit
    val t1 = cat.history("t").filter(col("version") === 1L)
      .select("ts_millis").as[Long].head()
    Thread.sleep(5) // the bad appends must land strictly after t1
    cat.appendAtomic("t", Seq((100L, 100L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((101L, 101L)).toDF("k", "v"))
    val restored = spark.sql(
      s"CALL $g.system.restore_timestamp('t', $t1)").as[Long].head()
    assert(restored === 4L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 7L)
    // ANALYZE from SQL: stats land, detail's rows turns known
    val an = spark.sql(s"CALL $g.system.analyze('t', 'k,v', '')")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(an.map(_._1).distinct === Seq(7L)) // rows
    assert(an.map(_._3).sorted === Seq("k", "v"))
    assert(an.forall(_._4 === 7L)) // both columns fully distinct
    assert(spark.sql(s"CALL $g.system.describe_detail('t')")
      .head().getLong(1) === 7L)
  }

  test("PARTITIONED BY (identity col) maps onto the plain partitioned layout") {
    val (cat, g) = freshSqlCat()
    spark.sql(
      s"CREATE TABLE $g.f (k BIGINT, v BIGINT, dt STRING) PARTITIONED BY (dt)")
    spark.sql(s"INSERT INTO $g.f VALUES (1, 10, 'd1'), (2, 20, 'd2')")
    spark.sql(s"INSERT INTO $g.f VALUES (3, 30, 'd1')") // INSERT appends
    assert(spark.sql(s"SELECT sum(v) FROM $g.f").as[Long].head() === 60L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("f"), "dt=d1")))
    // the layout prunes: a dt probe reads only its directory
    val pruned = spark.sql(s"SELECT * FROM $g.f WHERE dt = 'd1'")
    assert(pruned.count() === 2L)
    // the scan's input partitions name only the probed directory
    // (unwrap AQE: the BatchScan lives inside the adaptive plan)
    val physical = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scannedFiles = physical.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.flatten.collect {
          case p: org.apache.spark.sql.execution.datasources.FilePartition =>
            p.files.map(_.filePath.toString).toSeq
        }.flatten
    }.flatten
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains("dt=d1")),
      s"partition pruning failed: $scannedFiles plan=${physical.treeString}")
    assert(physical.treeString.contains("PartitionFilters: [isnotnull(dt"),
      s"no partition filter in the scan:\n${physical.treeString}")
    // DELETE routes through the partition-granular purge
    spark.sql(s"DELETE FROM $g.f WHERE dt = 'd2'")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("f"), "dt=d2")),
      "a fully-purged partition's directory must disappear")
    assert(spark.sql(s"SELECT count(*) FROM $g.f").as[Long].head() === 2L)
    // INSERT OVERWRITE replaces everything but keeps the layout
    spark.sql(s"INSERT OVERWRITE $g.f VALUES (9, 90, 'd9')")
    assert(spark.sql(s"SELECT k FROM $g.f").as[Long].collect().toSeq
      === Seq(9L))
    assert(cat.partitionSpec("f").map(_._1) === Some(Seq("dt")))
  }

  test("PARTITIONED BY (a, b) nests directories; pruning hits both levels") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.m (k BIGINT, v BIGINT, dt STRING, " +
      "region STRING) PARTITIONED BY (dt, region)")
    spark.sql(s"INSERT INTO $g.m VALUES (1, 10, 'd1', 'eu'), " +
      "(2, 20, 'd1', 'us'), (3, 30, 'd2', 'eu')")
    spark.sql(s"INSERT INTO $g.m VALUES (4, 40, 'd2', 'us')")
    assert(spark.sql(s"SELECT sum(v) FROM $g.m").as[Long].head() === 100L)
    // the Hive layout nests in declaration order
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("m"), "dt=d1", "region=eu")))
    // both-level probe reads exactly one leaf directory
    val pruned = spark.sql(
      s"SELECT * FROM $g.m WHERE dt = 'd2' AND region = 'us'")
    assert(pruned.count() === 1L)
    val physical = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!physical.contains("region=eu") && !physical.contains("dt=d1"),
      s"pruning leaked other partitions:\n$physical")
    // OVERWRITE keeps the layout
    spark.sql(s"INSERT OVERWRITE $g.m VALUES (9, 90, 'd3', 'ap')")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("m"), "dt=d3", "region=ap")))
    assert(spark.sql(s"SELECT count(*) FROM $g.m").as[Long].head() === 1L)
    // bucket/temporal/truncate transforms are supported since r13
    // (PartitionTransformSpec); an unknown transform still refuses
    assertThrows[Exception](spark.sql(
      s"CREATE TABLE $g.f3 (k BIGINT, a STRING) " +
        "PARTITIONED BY (zorder(a))"))
  }

  test("DELETE + UPDATE on a multi-column-partitioned table rewrite only " +
      "the affected leaves (r11 verdict #4)") {
    def leafFiles(dir: java.nio.file.Path): Set[String] = {
      import scala.jdk.CollectionConverters._
      if (!java.nio.file.Files.exists(dir)) Set.empty
      else {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally s.close()
      }
    }
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.m (k BIGINT, v BIGINT, dt STRING, " +
      "region STRING) PARTITIONED BY (dt, region)")
    spark.sql(s"INSERT INTO $g.m VALUES (1, 10, 'd1', 'eu'), " +
      "(2, 20, 'd1', 'us'), (3, 30, 'd2', 'eu'), (4, 40, 'd2', 'us'), " +
      "(5, 50, 'd2', 'us')")
    val untouched = java.nio.file.Paths.get(cat.path("m"), "dt=d1", "region=eu")
    val before = leafFiles(untouched)
    assert(before.nonEmpty)
    // DELETE with a row-level predicate: only leaves holding matches
    // rewrite; the fully-purged leaf directory disappears
    spark.sql(s"DELETE FROM $g.m WHERE k = 3")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("m"), "dt=d2", "region=eu")))
    assert(leafFiles(untouched) === before,
      "an untouched leaf must keep its files byte-for-byte")
    assert(spark.sql(s"SELECT count(*) FROM $g.m").as[Long].head() === 4L)
    // UPDATE scoped by partition columns: the scan prunes to the
    // matching leaves and ONLY they rewrite
    spark.sql(s"UPDATE $g.m SET v = v + 1 WHERE dt = 'd2' AND region = 'us'")
    assert(leafFiles(untouched) === before,
      "a partition-pruned UPDATE must not rewrite other leaves")
    assert(spark.sql(s"SELECT sum(v) FROM $g.m WHERE dt = 'd2'")
      .as[Long].head() === 92L)
    assert(spark.sql(s"SELECT sum(v) FROM $g.m").as[Long].head() === 122L)
    // UPDATE whose predicate needs data columns: whole-table group —
    // still correct, layout preserved
    spark.sql(s"UPDATE $g.m SET v = 0 WHERE k = 1")
    assert(spark.sql(s"SELECT sum(v) FROM $g.m").as[Long].head() === 112L)
    assert(cat.partitionSpec("m").map(_._1) === Some(Seq("dt", "region")))
    // an UPDATE that moves rows into an EXISTING unscanned leaf refuses
    // loudly instead of clobbering it (d1/us holds k=2)
    val e = intercept[Exception](spark.sql(
      s"UPDATE $g.m SET dt = 'd1' WHERE dt = 'd2' AND region = 'us'"))
    assert(e.getMessage.contains("unscanned partition"))
    assert(spark.sql(s"SELECT count(*) FROM $g.m WHERE dt = 'd1'")
      .as[Long].head() === 2L) // the refused move changed nothing
    // a move into a NON-existing leaf is additive: the new leaf is
    // born, the source leaf rewrites without the moved rows
    spark.sql(s"UPDATE $g.m SET region = 'sa' WHERE dt = 'd2' AND region = 'us'")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("m"), "dt=d2", "region=sa")))
    assert(spark.sql(s"SELECT count(*) FROM $g.m WHERE region = 'us' AND dt = 'd2'")
      .as[Long].head() === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $g.m WHERE region = 'sa'")
      .as[Long].head() === 2L)
    // MERGE INTO the nested layout: data-column ON condition → the
    // whole-table group; updates and inserts land, layout preserved
    spark.sql(s"CREATE TABLE $g.src2 (k BIGINT, v BIGINT, dt STRING, " +
      "region STRING)")
    spark.sql(s"INSERT INTO $g.src2 VALUES (1, 1000, 'd1', 'eu'), " +
      "(77, 7700, 'd7', 'ap')")
    spark.sql(s"""MERGE INTO $g.m USING $g.src2 s ON m.k = s.k
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT v FROM $g.m WHERE k = 1").as[Long].head() === 1000L)
    assert(spark.sql(s"SELECT count(*) FROM $g.m WHERE dt = 'd7'")
      .as[Long].head() === 1L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("m"), "dt=d7", "region=ap")))
    assert(cat.partitionSpec("m").map(_._1) === Some(Seq("dt", "region")))
  }

  test("CALL delete_vectorize runs the O(matches) MoR delete from SQL; " +
      "apply_delete_vectors folds and unblocks bare reads") {
    val (cat, g) = freshSqlCat()
    cat.append("p", (1 to 100).map(i => (i.toLong, (i % 10).toLong))
      .toDF("k", "m"))
    // 5 matches of 100 rows — under the 10% auto-fold threshold, so the
    // vectors stay LIVE (the point of the O(matches) path)
    val n = spark.sql(
      s"CALL $g.system.delete_vectorize('p', 'k > 95')")
      .as[Long].head()
    assert(n === 5L)
    // bare SQL reads refuse while vectors live (the existing guard)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $g.p").collect())
    assert(e.getMessage.contains("deletion vectors"))
    assert(cat.readMor("p").count() === 95L)
    val folded = spark.sql(s"CALL $g.system.apply_delete_vectors('p')")
      .as[Long].head()
    assert(folded === 5L)
    assert(spark.sql(s"SELECT count(*) FROM $g.p").as[Long].head() === 95L)
    // a garbage predicate fails loudly at the parser, not silently
    assertThrows[Exception](spark.sql(
      s"CALL $g.system.delete_vectorize('p', 'no_such_col ===')").collect())
  }

  test("CALL add_constraint/drop_constraint + optimize_zorder round out " +
      "the SQL-only table lifecycle") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 50).map(i => (i.toLong, (i % 5).toLong))
      .toDF("k", "v").repartition(4))
    // declare the contract from SQL; it judges existing rows first
    spark.sql(s"CALL $g.system.add_constraint('t', 'k_pos', 'k > 0')").collect()
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $g.t VALUES (-1, 0)"))
    assert(e.getMessage.contains("k_pos"))
    // a constraint the existing rows violate refuses at declaration
    val e2 = intercept[Exception](spark.sql(
      s"CALL $g.system.add_constraint('t', 'v_big', 'v > 100')").collect())
    assert(String.valueOf(e2.getMessage).nonEmpty)
    spark.sql(s"CALL $g.system.drop_constraint('t', 'k_pos')").collect()
    spark.sql(s"INSERT INTO $g.t VALUES (-1, 0)") // allowed again
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 51L)
    // Z-order clustering from SQL: one staged-rewrite commit, content
    // identical, stats re-analyzed at the new version
    val r = spark.sql(s"CALL $g.system.optimize_zorder('t', 'k,v')").head()
    assert(r.getLong(0) === 51L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 51L)
    assert(cat.history("t").filter(col("op") === "OPTIMIZE_ZORDER")
      .count() === 1L)
    assert(cat.stats("t").exists(_.version === cat.currentVersion("t")))
  }

  test("DROP TABLE removes plain and versioned tables; IF EXISTS is quiet") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v")) // versioned
    cat.append("p", Seq((1L, 2L)).toDF("k", "v"))        // plain
    spark.sql(s"DROP TABLE $g.d")
    spark.sql(s"DROP TABLE $g.p")
    assert(!cat.exists("d") && !cat.exists("p"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(cat.path("d"))))
    spark.sql(s"DROP TABLE IF EXISTS $g.ghost") // absent: quiet no-op
    // a re-created table of the dropped name starts from scratch
    cat.replaceAtomic("d", Seq((9L, 9L)).toDF("k", "v"))
    assert(cat.currentVersion("d").contains(1L))
    assert(cat.read("d").as[(Long, Long)].collect().toSeq === Seq((9L, 9L)))
  }

  test("a failed CTAS surfaces the write error and leaves no half-born table") {
    val (cat, g) = freshSqlCat()
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE $g.broken AS " +
        "SELECT id, CAST(raise_error('ctas-boom') AS BIGINT) AS v FROM range(3)"))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("ctas-boom")),
      s"the ROOT write error must surface, not the cleanup: ${chain(e)}")
    // Spark's non-atomic CTAS invoked dropTable to clean up
    assert(!cat.exists("broken"))
  }

  test("SQL DELETE refuses to commit over a concurrent write (lost update)") {
    val (cat, _) = freshSqlCat()
    val v1 = cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    // the statement's survivors plan, resolved against v1
    val survivors = cat.read("t").filter(col("k") =!= 1L)
    // a concurrent commit lands between the scan and the lock
    cat.appendAtomic("t", Seq((3L, 30L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      cat.replaceAtomicExpect("t", survivors, Some(v1)))
    assert(e.getMessage.contains("moved"))
    // nothing was overwritten: the concurrent append survives
    assert(cat.read("t").count() === 3L)
    // with the CURRENT version pinned the commit goes through
    cat.replaceAtomicExpect("t",
      cat.read("t").filter(col("k") =!= 1L), cat.currentVersion("t"))
    assert(cat.read("t").as[(Long, Long)].collect().toSet ===
      Set((2L, 20L), (3L, 30L)))
  }

  test("INSERT INTO / OVERWRITE write through the commit verbs") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d", Seq((1L, 2L), (2L, 3L)).toDF("k", "v"))
    spark.sql(s"INSERT INTO $g.d VALUES (9, 9)")
    // the SQL write is a REAL versioned commit: pointer advanced,
    // history logged as APPEND, prior snapshot carried by hard link
    val v2 = cat.currentVersion("d").get
    assert(v2 === v1 + 1)
    assert(spark.sql(s"SELECT sum(k) FROM $g.d").as[Long].head() === 12L)
    val ops = cat.history("d").orderBy("version")
      .select("op").as[String].collect().toSeq
    assert(ops.last === "APPEND")
    // and the change feed sees exactly the inserted row
    val feed = cat.changesBetween("d", v1, v2, Seq("k")).collect()
    assert(feed.map(r => (r.getLong(0),
      r.getString(r.fieldIndex("change_type")))).toSeq === Seq((9L, "insert")))
    // INSERT OVERWRITE → replaceAtomic: full rewrite, old version retained
    spark.sql(s"INSERT OVERWRITE $g.d VALUES (5, 5)")
    assert(spark.sql(s"SELECT k FROM $g.d").as[Long].collect().toSeq === Seq(5L))
    assert(spark.sql(s"SELECT count(*) FROM $g.d VERSION AS OF $v2")
      .as[Long].head() === 3L)
    // schema drift is refused by the evolution gate, not silently cast
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $g.d VALUES (1, 2, 3)"))
    assert(e.getMessage.nonEmpty)
    // time travel is read-only: no INSERT into the past
    assertThrows[Exception](
      spark.sql(s"INSERT INTO $g.d VERSION AS OF $v2 VALUES (1, 1)"))
  }

  test("DELETE FROM rewrites survivors as one versioned commit") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d",
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    spark.sql(s"DELETE FROM $g.d WHERE k % 10 = 0 OR v > 95")
    assert(spark.sql(s"SELECT count(*) FROM $g.d").as[Long].head() === 86L)
    // a real versioned commit: old snapshot retained, history REPLACE,
    // the change feed classifies the deletes
    assert(spark.sql(s"SELECT count(*) FROM $g.d VERSION AS OF $v1")
      .as[Long].head() === 100L)
    val feed = cat.changesBetween("d", v1, v1 + 1, Seq("k"))
    assert(feed.filter(col("change_type") === "delete").count() === 14L)
    assert(feed.filter(col("change_type") =!= "delete").count() === 0L)
    // DELETE against time travel refuses in analysis
    assertThrows[Exception](
      spark.sql(s"DELETE FROM $g.d VERSION AS OF $v1 WHERE k = 1"))
  }

  test("ALTER TABLE ADD COLUMN evolves additively; bad alters stay refused") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v"))
    spark.sql(s"ALTER TABLE $g.d ADD COLUMN w BIGINT")
    // no data rewritten: the declared schema is the union, old rows
    // null-fill, and INSERT can now carry the new column
    assert(spark.table(s"$g.d").columns.toSeq === Seq("k", "v", "w"))
    assert(spark.sql(s"SELECT w FROM $g.d").collect().map(_.isNullAt(0)).toSeq
      === Seq(true))
    spark.sql(s"INSERT INTO $g.d VALUES (2, 3, 4)")
    assert(spark.sql(s"SELECT sum(w) FROM $g.d").as[Long].head() === 4L)
    // time travel keeps the shape v1 HAD
    assert(spark.sql(s"SELECT * FROM $g.d VERSION AS OF $v1").columns.toSeq
      === Seq("k", "v"))
    // DROP/RENAME are now metadata commits through column mapping
    // (ColumnMappingSpec covers them); what stays refused is anything
    // that would change what existing bytes mean without the mapping
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $g.d ADD COLUMN v BIGINT")) // duplicate
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $g.d ALTER COLUMN v TYPE INT")) // type change
    // NOT NULL is unsatisfiable (old rows null-fill): refused, not
    // silently downgraded to nullable
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE $g.d ADD COLUMN nn BIGINT NOT NULL"))
    // reserved names never land in the internal namespace
    assertThrows[Exception](
      spark.sql(s"CREATE TABLE $g.`_tmp_x` (k BIGINT)"))
  }

  test("CREATE TABLE + CTAS are born versioned and INSERTable") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.fresh (k BIGINT, s STRING)")
    assert(cat.currentVersion("fresh").contains(1L) ||
      cat.currentVersion("fresh").isDefined)
    assert(spark.sql(s"SELECT count(*) FROM $g.fresh").as[Long].head() === 0L)
    spark.sql(s"INSERT INTO $g.fresh VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT sum(k) FROM $g.fresh").as[Long].head() === 3L)
    spark.sql(s"CREATE TABLE $g.ctas AS SELECT k, s FROM $g.fresh WHERE k = 2")
    assert(spark.sql(s"SELECT k, s FROM $g.ctas").as[(Long, String)]
      .collect().toSeq === Seq((2L, "b")))
    // duplicate CREATE is loud (identity-partitioned CREATE is now
    // supported — its own test covers the partitioned layout)
    assertThrows[Exception](
      spark.sql(s"CREATE TABLE $g.fresh (k BIGINT)"))
  }

  test("UPDATE rewrites matching rows; untouched rows survive pushdown") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d",
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    spark.sql(s"UPDATE $g.d SET v = v + 1000 WHERE k % 10 = 3")
    // the group-granularity trap: if the statement's condition reached
    // the parquet reader as a row filter, the 90 NON-matching rows
    // would have vanished from the replacement — assert they survived
    assert(spark.sql(s"SELECT count(*) FROM $g.d").as[Long].head() === 100L)
    assert(spark.sql(s"SELECT sum(v) FROM $g.d").as[Long].head()
      === (0 until 100).map(_.toLong).sum + 10 * 1000L)
    assert(spark.sql(s"SELECT v FROM $g.d WHERE k = 13").as[Long].head()
      === 1013L)
    // a real versioned commit: history op UPDATE, old snapshot readable
    assert(cat.history("d").orderBy("version").select("op")
      .as[String].collect().last === "UPDATE")
    assert(spark.sql(s"SELECT sum(v) FROM $g.d VERSION AS OF $v1")
      .as[Long].head() === (0 until 100).map(_.toLong).sum)
    // the change feed classifies exactly the 10 touched keys as updates
    val feed = cat.changesBetween("d", v1, v1 + 1, Seq("k"))
    assert(feed.filter(col("change_type") === "update").count() === 10L)
    assert(feed.filter(col("change_type") === "insert").count() === 0L)
    // UPDATE against time travel refuses in analysis
    assertThrows[Exception](
      spark.sql(s"UPDATE $g.d VERSION AS OF $v1 SET v = 0 WHERE k = 1"))
  }

  test("MERGE INTO routes matched/unmatched actions through one commit") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"))
    Seq((2L, 200L), (3L, -1L), (4L, 400L)).toDF("k", "v")
      .createOrReplaceTempView("src")
    spark.sql(
      s"""MERGE INTO $g.t AS t USING src AS s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, 'new', s.v)
         |""".stripMargin)
    assert(spark.sql(s"SELECT k, s, v FROM $g.t ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq
      === Seq((1L, "a", 10L), (2L, "b", 200L), (4L, "new", 400L)))
    assert(cat.history("t").orderBy("version").select("op")
      .as[String].collect().last === "MERGE")
    // optimistic concurrency: a staged rewrite over a MOVED table refuses
    val stale = intercept[Exception](cat.replaceFromStaged("t",
      java.nio.file.Paths.get(cat.path("t"), "_tmp_rlo_x"), "UPDATE",
      Some(1L), spark.table(s"$g.t").schema))
    assert(stale.getMessage.contains("moved"))
  }

  test("DELETE with an untranslatable predicate falls back to the rewrite") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d",
      Seq((1L, "aa"), (2L, "bbb"), (3L, "c")).toDF("k", "s"))
    // length(s) defeats the metadata-delete translation (canDeleteWhere
    // false) — previously this statement was REFUSED; the row-level
    // rewrite now handles it
    spark.sql(s"DELETE FROM $g.d WHERE length(s) > 2")
    assert(spark.sql(s"SELECT k FROM $g.d ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 3L))
    // delete-all stages zero files: the snapshot stays readable
    spark.sql(s"DELETE FROM $g.d WHERE length(s) > 0")
    assert(spark.sql(s"SELECT count(*) FROM $g.d").as[Long].head() === 0L)
    assert(spark.table(s"$g.d").columns.toSeq === Seq("k", "s"))
    // no staging residue survives a completed statement
    val leftovers = Files.list(java.nio.file.Paths.get(cat.path("d")))
    try {
      import scala.jdk.CollectionConverters._
      assert(!leftovers.iterator().asScala.exists(
        _.getFileName.toString.startsWith("_tmp_rlo_")))
    } finally leftovers.close()
  }

  test("an uncommitted snapshot directory is never served") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v"))
    // a crashed writer's partial `_v7` sits on disk with the pointer
    // still at 1 — `VERSION AS OF 7` must refuse (r10 review: bare
    // Files.exists served partial rows), not read the half-written dir
    Files.createDirectories(java.nio.file.Paths.get(cat.path("d"), "_v7"))
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.d VERSION AS OF 7").collect())
      .getMessage.nonEmpty)
    // the committed version still resolves
    assert(spark.sql(s"SELECT k FROM $g.d VERSION AS OF 1").count() === 1L)
  }

  test("TIMESTAMP AS OF travels through plain SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, "a")).toDF("k", "s"))
    Thread.sleep(30)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(30)
    cat.replaceAtomic("d", Seq((1L, "b")).toDF("k", "s"))
    assert(spark.sql(s"SELECT s FROM $g.d TIMESTAMP AS OF '$between'")
      .as[String].head() === "a")
    assert(spark.sql(s"SELECT s FROM $g.d").as[String].head() === "b")
    // a probe before the first commit refuses — serving the current
    // snapshot for a pre-history instant would lie about what existed
    assert(intercept[Exception](spark.sql(
      s"SELECT * FROM $g.d TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
      .getMessage.nonEmpty)
  }

  test("SQL row-level DML on a branch closes the repair loop: stage, " +
      "audit fails, UPDATE/MERGE the branch, audit passes, publish " +
      "(r12 verdict #2)") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("t", (1 to 5).map(i => (i.toLong, i.toLong * 10))
      .toDF("k", "v"))
    // stage a batch with a bad row (v = -1 fails the audit rule v > 0)
    spark.sql(s"INSERT INTO $g.`t@fix` VALUES (6, 60), (7, -1)")
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@fix` WHERE v <= 0")
      .as[Long].head() === 1L) // audit fails
    // the fix verb is plain SQL UPDATE on the branch relation
    spark.sql(s"UPDATE $g.`t@fix` SET v = 70 WHERE v <= 0")
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@fix` WHERE v <= 0")
      .as[Long].head() === 0L) // audit passes
    assert(spark.sql(s"SELECT count(*) FROM $g.`t@fix`").as[Long].head() === 7L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 5L,
      "the fix leaked to main before publish")
    // MERGE INTO the branch works too (second repair pass)
    spark.sql(s"MERGE INTO $g.`t@fix` tgt USING " +
      "(SELECT 6 AS k, 66 AS v) src ON tgt.k = src.k " +
      "WHEN MATCHED THEN UPDATE SET v = src.v")
    assert(spark.sql(s"SELECT v FROM $g.`t@fix` WHERE k = 6")
      .as[Long].head() === 66L)
    // publish lands the FIXED state as one REPLACE
    spark.sql(s"CALL $g.system.publish_branch('t', 'fix')").collect()
    assert(cat.branches("t").isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").as[Long].head() === 7L)
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 7").as[Long].head() === 70L)
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 6").as[Long].head() === 66L)
    // time travel still reaches the pre-publish shape
    assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 1")
      .as[Long].head() === 5L)
    // row-level on an UNBORN branch refuses (INSERT creates branches)
    val e = intercept[Exception](
      spark.sql(s"UPDATE $g.`t@nosuch` SET v = 0 WHERE k = 1"))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // a time-travel relation stays read-only
    assertThrows[Exception](
      spark.sql(s"UPDATE $g.t VERSION AS OF 1 SET v = 0"))
  }

  test("CALL g.system.repartition evolves the partition spec: one " +
      "staged rewrite into the new leaf layout, then DML prunes by the " +
      "new columns and leaves untouched leaves byte-for-byte (r12 #3)") {
    import java.nio.file.Paths
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rt (k BIGINT, v BIGINT, y BIGINT, m BIGINT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.rt SELECT id AS k, id AS v, id % 2 AS y, " +
      "id % 3 AS m FROM range(60)")
    assert(Files.exists(Paths.get(cat.path("rt"), "y=0")))
    assert(!Files.exists(Paths.get(cat.path("rt"), "y=0/m=0")))
    val expectedSum = (0 until 60).sum.toLong
    spark.sql(s"CALL $g.system.repartition('rt', 'y,m')").collect()
    // the layout evolved under the same rows
    assert(Files.exists(Paths.get(cat.path("rt"), "y=0/m=0")))
    assert(spark.sql(s"SELECT sum(v) FROM $g.rt").as[Long].head()
      === expectedSum)
    assert(spark.sql(s"SELECT count(*) FROM $g.rt").as[Long].head() === 60L)
    // DML now prunes by BOTH columns: pin an untouched leaf's files
    def leafFiles(leaf: String): Set[String] = {
      val d = Paths.get(cat.path("rt"), leaf)
      import scala.jdk.CollectionConverters._
      val st = Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally st.close()
    }
    val pinned = leafFiles("y=1/m=1")
    spark.sql(s"DELETE FROM $g.rt WHERE y = 0 AND m = 0")
    assert(spark.sql(s"SELECT count(*) FROM $g.rt WHERE y = 0 AND m = 0")
      .as[Long].head() === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $g.rt").as[Long].head() === 50L)
    assert(leafFiles("y=1/m=1") === pinned,
      "an untouched leaf was rewritten by the pruned DELETE")
    // same-spec evolve is a no-op; unknown columns and versioned
    // tables refuse loudly
    spark.sql(s"CALL $g.system.repartition('rt', 'y,m')").collect()
    assert(spark.sql(s"SELECT count(*) FROM $g.rt").as[Long].head() === 50L)
    assertThrows[Exception](
      spark.sql(s"CALL $g.system.repartition('rt', 'nope')").collect())
    cat.replaceAtomic("vt", Seq((1L, 2L)).toDF("k", "v"))
    val ev = intercept[Exception](
      spark.sql(s"CALL $g.system.repartition('vt', 'k')").collect())
    assert(ev.getMessage.contains("no partition spec"), ev.getMessage)
  }

  test("a partition created mid-statement survives a partitioned " +
      "row-level rewrite: the commit replaces the set pinned at scan " +
      "time, never a live recompute (ADVICE r12 medium)") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.pt (k BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $g.pt SELECT id AS k, id AS v, id % 2 AS p " +
      "FROM range(40)")
    // the latch gate makes the interleave DETERMINISTIC: every UPDATE
    // row blocks until the concurrent INSERT has fully landed, so the
    // insert provably falls between the scan build and the commit
    R13Gate.reset()
    spark.udf.register("gate_r13a", (x: Long) => R13Gate.pass(x))
    @volatile var err: Throwable = null
    val th = new Thread(() => {
      try {
        R13Gate.scanStarted.await(30, java.util.concurrent.TimeUnit.SECONDS)
        // p=3 MATCHES the statement's pushed predicate but did not
        // exist at scan time — a live recompute at commit would join
        // it to the replaced set and wipe it (no staged rows carry it)
        spark.sql(s"INSERT INTO $g.pt VALUES (9999, 9999, 3)")
      } catch { case t: Throwable => err = t }
      finally R13Gate.writeDone.countDown()
    })
    th.start()
    // the new leaf is NOT a scanned one, so the pre-image check stays
    // quiet and the statement commits — against the PINNED set
    spark.sql(s"UPDATE $g.pt SET v = gate_r13a(v) + 1 WHERE p < 4")
    th.join()
    assert(err == null, s"concurrent insert failed: $err")
    assert(spark.sql(s"SELECT count(*) FROM $g.pt WHERE p = 3")
      .as[Long].head() === 1L,
      "the concurrently created partition was wiped by the row-level commit")
    assert(spark.sql(s"SELECT sum(v) FROM $g.pt WHERE p < 2")
      .as[Long].head() === (0 until 40).map(_ + 1).sum.toLong,
      "the update itself must still have landed on the scanned leaves")
  }

  test("a concurrent write INTO a scanned leaf refuses the partitioned " +
      "row-level commit: the pre-image fingerprint moved, the statement " +
      "is stale, the inserted rows survive (ADVICE r12 medium)") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.pt2 (k BIGINT, v BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $g.pt2 SELECT id AS k, id AS v, id % 2 AS p " +
      "FROM range(40)")
    R13Gate.reset()
    spark.udf.register("gate_r13b", (x: Long) => R13Gate.pass(x))
    @volatile var err: Throwable = null
    val th = new Thread(() => {
      try {
        R13Gate.scanStarted.await(30, java.util.concurrent.TimeUnit.SECONDS)
        spark.sql(s"INSERT INTO $g.pt2 VALUES (8888, 8888, 0)") // scanned leaf
      } catch { case t: Throwable => err = t }
      finally R13Gate.writeDone.countDown()
    })
    th.start()
    val e = intercept[Exception](
      spark.sql(s"UPDATE $g.pt2 SET v = gate_r13b(v) + 1 WHERE p = 0"))
    th.join()
    assert(err == null, s"concurrent insert failed: $err")
    assert(e.getMessage != null && e.getMessage.contains("stale"),
      s"expected the staleness refusal, got: ${e.getMessage}")
    assert(spark.sql(s"SELECT count(*) FROM $g.pt2 WHERE k = 8888")
      .as[Long].head() === 1L,
      "the concurrent insert into a scanned leaf was silently wiped")
    // and the refused statement left the scanned leaf's rows untouched
    assert(spark.sql(s"SELECT sum(v) FROM $g.pt2 WHERE p = 0 AND k < 8888")
      .as[Long].head() === (0 until 40 by 2).sum.toLong)
  }
}

/** Deterministic interleave gate for the ADVICE-r12-medium specs: the
  * row-level statement's UDF blocks every row until the concurrent
  * INSERT fully lands, proving the insert falls between the scan build
  * and the commit. A global object so local-mode executor threads reach
  * the SAME latches without closure serialization. */
object R13Gate {
  @volatile var scanStarted: java.util.concurrent.CountDownLatch = _
  @volatile var writeDone: java.util.concurrent.CountDownLatch = _
  private val blockerClaimed = new java.util.concurrent.atomic.AtomicBoolean
  def reset(): Unit = {
    scanStarted = new java.util.concurrent.CountDownLatch(1)
    writeDone = new java.util.concurrent.CountDownLatch(1)
    blockerClaimed.set(false)
  }
  // only ONE task blocks (the commit still waits for it, which is all
  // the interleave needs) — blocking every row would park all
  // local[4] slots and starve the concurrent INSERT into a deadlock
  def pass(x: Long): Long = {
    if (blockerClaimed.compareAndSet(false, true)) {
      scanStarted.countDown()
      writeDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
    }
    x
  }
}
