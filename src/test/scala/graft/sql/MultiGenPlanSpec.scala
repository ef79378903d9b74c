package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.catalog.TableCatalog
import java.nio.file.Files

/** PLAN-level pruning evidence for the composite multi-root scans (in
  * package graft.sql to reach the private partition types): the
  * per-generation union and the pv branch union must PLAN only the
  * matching leaves — the honest test of "each leg prunes under its own
  * spec", stronger than row correctness (which a full scan + row
  * filter would also pass). */
class MultiGenPlanSpec extends AnyFunSuite with graft.SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("mgp").toString
    seq += 1
    val name = s"gmgp$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  /** The leaf-directory values the PLANNED input partitions touch for
    * partition column `pcol` — what pruning actually narrowed. */
  private def plannedLeaves(df: DataFrame, pcol: String): Set[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec =>
        b.scan match {
          case m: MultiGenScan =>
            m.toBatch.planInputPartitions().toSeq.flatMap {
              case MultiGenPartition(_, fp: FilePartition) =>
                fp.files.map(_.filePath.toString)
              case _ => Seq.empty[String]
            }
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.toBatch.planInputPartitions().toSeq.flatMap {
              case fp: FilePartition => fp.files.map(_.filePath.toString)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten.flatMap(_.split("/").find(_.startsWith(pcol + "="))).toSet

  test("a lazily-evolved PLAIN table's SQL read plans only the probed " +
      "partition's leaves — in BOTH generations") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.lz (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.lz VALUES (1, 2020, 1), (2, 2021, 2)")
    cat.repartitionTableLazy("lz",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.insertPartitioned("lz",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    val q = spark.sql(s"SELECT k FROM $g.lz WHERE y = 2021")
    assert(q.as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    assert(plannedLeaves(q, "y") === Set("y=2021"),
      "both generations must prune to the probed leaf at PLAN time")
  }

  test("a lazily-evolved PV table's SQL read plans only the probed " +
      "leaves inside the pinned snapshot, across generations; time " +
      "travel prunes the OLD layout") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.pv (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("pv",
      Seq((1L, 2020, 1), (2L, 2021, 2)).toDF("k", "y", "m"))
    cat.repartitionTableLazy("pv",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned("pv",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    val q = spark.sql(s"SELECT k FROM $g.pv WHERE y = 2021")
    assert(q.as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    assert(plannedLeaves(q, "y") === Set("y=2021"))
    val tt = spark.sql(s"SELECT k FROM $g.pv VERSION AS OF 2 " +
      "WHERE y = 2020")
    assert(tt.as[Long].collect().toSeq === Seq(1L))
    assert(plannedLeaves(tt, "y") === Set("y=2020"),
      "time travel must prune the pre-evolution snapshot's own layout")
  }

  test("a PV branch's SQL audit read plans only the probed leaves — " +
      "across the base snapshot AND the staged tree") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.f (k BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('versioned'='true')")
    spark.sql(s"INSERT INTO $g.f VALUES (1, '2024-01-01'), " +
      "(2, '2024-01-02')")
    spark.sql(s"INSERT INTO $g.`f@wap` VALUES (3, '2024-01-02'), " +
      "(4, '2024-01-03')")
    val q = spark.sql(s"SELECT k FROM $g.`f@wap` WHERE dt = '2024-01-02'")
    assert(q.as[Long].collect().sorted.toSeq === Seq(2L, 3L),
      "the audit read must union base and staged rows")
    assert(plannedLeaves(q, "dt") === Set("dt=2024-01-02"),
      "BOTH branch-read roots must prune to the probed leaf")
    cat.dropBranch("f", "wap")
  }

  test("a MIXED-projection multi-generation read stays COLUMNAR: the " +
      "generation whose pruned output order differs gets a zero-copy " +
      "vector reorder, not the row fallback (r16)") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.cx (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.cx VALUES (1, 2020, 1), (2, 2021, 2)")
    cat.repartitionTableLazy("cx",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.insertPartitioned("cx",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    // requesting (k, y, m) puts the generations' pruned outputs in
    // DIFFERENT orders (gen0: data (k,m) then dir-y; gen1: data (k)
    // then dir-(y,m)) — the r15 code fell back to rows here
    val q = spark.sql(s"SELECT k, y, m FROM $g.cx")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[MultiGenScan] => b
    }
    assert(scans.nonEmpty, "the read must plan through the composite")
    assert(scans.forall(_.supportsColumnar),
      "a mixed-projection multi-generation read must stay columnar")
    assert(q.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq ===
      Seq((1L, 2020, 1), (2L, 2021, 2), (3L, 2021, 3), (4L, 2020, 4)),
      "the reordered vectors must serve the right values")
    // and the row path (a non-columnar consumer) still projects right
    assert(q.as[(Long, Int, Int)].collect().sortBy(_._1).toSeq ===
      Seq((1L, 2020, 1), (2L, 2021, 2), (3L, 2021, 3), (4L, 2020, 4)))
  }

  test("SPARK-BUMP CANARY (r17): the composite builder RECEIVES " +
      "catalyst filters through the internal " +
      "SupportsPushDownCatalystFilters seam and every inner builder " +
      "accepts the forward — if an upgrade drops the trait, this " +
      "fails by name instead of pruning silently regressing") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.cn (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y)")
    spark.sql(s"INSERT INTO $g.cn VALUES (1, 2020, 1), (2, 2021, 2)")
    cat.repartitionTableLazy("cn",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.insertPartitioned("cn",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    val q = spark.sql(s"SELECT k FROM $g.cn WHERE y = 2021")
    assert(q.as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[MultiGenScan] =>
        b.scan.asInstanceOf[MultiGenScan]
    }
    assert(scans.nonEmpty, "the read must plan through the composite")
    scans.foreach { s =>
      assert(s.receivedFilters.nonEmpty,
        "SPARK UPGRADE REGRESSION: MultiGenScanBuilder received NO " +
          "catalyst filters — Spark no longer routes partition " +
          "predicates through " +
          "org.apache.spark.sql.internal.connector" +
          ".SupportsPushDownCatalystFilters; composite-scan pruning " +
          "has silently regressed to plan-every-leaf (see " +
          "MultiGenScan.scala's trait note)")
      assert(s.receivedFilters.exists(_.references.exists(_.name == "y")),
        s"the pushed filters must include the y probe: " +
          s"${s.receivedFilters}")
      assert(s.innerAccepted == 2,
        "SPARK UPGRADE REGRESSION: an inner FileScanBuilder no longer " +
          s"accepts catalyst filters (${s.innerAccepted} of 2 legs) — " +
          "its generation now plans every leaf")
    }
  }

  test("a REPLACE-mode branch audit on a 2-generation table whose " +
      "OLDER spec also materializes every claim column (r18): the " +
      "exclusion stays PLAN-TIME in both generations — claimed leaves " +
      "unplanned everywhere, scan COLUMNAR, no row-exclusion flip") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rc (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y, m) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("rc",
      Seq((1L, 2020, 1), (2L, 2021, 2)).toDF("k", "y", "m"))
    // NARROWING evolution (y, m) → (y): the claim column y is
    // identity partition-source in BOTH specs
    cat.repartitionTableLazy("rc", Seq(("identity", "y", 0)))
    cat.appendPartitionedVersioned("rc",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    // claim the whole y=2021 slice onto a branch
    cat.replacePartitionsOnBranch("rc", "br",
      Seq((20L, 2021, 9)).toDF("k", "y", "m"),
      dropParts = Seq.empty)
    val q = spark.sql(s"SELECT k FROM $g.`rc@br`")
    assert(q.as[Long].collect().sorted.toSeq === Seq(1L, 4L, 20L),
      "the audit must serve the branch state: base minus the claimed " +
        "slice plus the staged rows")
    val files = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec =>
        b.scan match {
          case mg: MultiGenScan =>
            mg.toBatch.planInputPartitions().toSeq.flatMap {
              case MultiGenPartition(_, fp: FilePartition) =>
                fp.files.map(_.filePath.toString)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(files.nonEmpty, "the read must plan through the composite")
    // plan-time exclusion in BOTH generations: no base y=2021 file is
    // planned anywhere (the staged root's y=2021 replacement is)
    val baseClaimed = files.filter(f => f.contains("y=2021") &&
      !f.contains("_branch"))
    assert(baseClaimed.isEmpty,
      s"claimed leaves must prune at plan time in EVERY generation " +
        s"when the claim columns are partition-source in both specs: " +
        baseClaimed.mkString(", "))
    // and the composite stays columnar — no row-exclusion leg
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[MultiGenScan] => b
    }
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "a shared-claim-column audit must stay columnar pre-compaction")
    cat.dropBranch("rc", "br")
  }

  test("a REPLACE-mode branch read on a 2-generation table (r17): the " +
      "claimed CURRENT-gen base leaf prunes at plan time, the OLDER " +
      "generation's leg carries an exact row-level exclusion (reading " +
      "claim columns the query didn't ask for), rows flip uniformly") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.rw (k BIGINT, y INT, m INT) " +
      "PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("rw",
      Seq((1L, 2020, 1), (2L, 2021, 2), (5L, 2021, 9)).toDF("k", "y", "m"))
    cat.repartitionTableLazy("rw",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned("rw",
      Seq((3L, 2021, 3), (4L, 2020, 4)).toDF("k", "y", "m"))
    // claims: (2021,2) excises gen0's k=2 (survivor k=5 in the same
    // y=2021 leaf); (2020,4) is a pure current-gen leaf drop
    cat.replacePartitionsOnBranch("rw", "br",
      Seq((20L, 2021, 2)).toDF("k", "y", "m"),
      dropParts = Seq(Seq(Some("2020"), Some("4"))))
    // SELECT only k: the older-gen leg must read y (dir-derived) and
    // m (data) for its exclusion, then drop them
    val q = spark.sql(s"SELECT k FROM $g.`rw@br`")
    assert(q.as[Long].collect().sorted.toSeq === Seq(1L, 3L, 5L, 20L),
      "the branch view must excise claim matches in BOTH generations")
    // plan evidence: the claimed current-gen leaf (_g1/y=2020/m=4) is
    // not planned; gen0's y=2021 leaf IS planned (its survivor needs
    // the row filter, which no leaf skip could express)
    val files = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec =>
        b.scan match {
          case mg: MultiGenScan =>
            mg.toBatch.planInputPartitions().toSeq.flatMap {
              case MultiGenPartition(_, fp: FilePartition) =>
                fp.files.map(_.filePath.toString)
              case _ => Seq.empty[String]
            }
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(files.nonEmpty, "the read must plan through the composite")
    assert(!files.exists(f => f.contains("_g1/y=2020/m=4")),
      s"the claimed current-gen base leaf must prune at plan time: " +
        files.mkString(", "))
    assert(files.exists(f => f.contains("y=2021") && !f.contains("_g1")),
      "gen0's partially-claimed leaf must still plan (row filter)")
    // the row-level exclusion flips the scan to rows, uniformly
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[MultiGenScan] => b
    }
    assert(scans.nonEmpty && scans.forall(!_.supportsColumnar),
      "a row-excluded leg must flip the whole composite to rows " +
        "(the exec demands agreement)")
    cat.dropBranch("rw", "br")
  }
}
