package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** The read-only integrity checker (r16): a healthy table answers
  * CLEAN; every injected crash residue class surfaces as the right
  * severity with the healing verb named — and fsck itself never
  * repairs, locks, or scans data. */
class FsckSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("fsck").toString
    seq += 1
    val name = s"gfsck$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("a healthy table — flat versioned and partitioned versioned — " +
      "answers clean, from Scala and SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("flat", (1 to 10).map(i => (i.toLong, i)).toDF("k", "v"))
    cat.appendAtomic("flat", Seq((11L, 11)).toDF("k", "v"))
    assert(cat.fsck("flat") === Seq.empty)
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "dt"))
    assert(cat.fsck("pv") === Seq.empty)
    assert(spark.sql(s"CALL $g.system.fsck('pv')").count() === 0L)
  }

  test("manifest drift surfaces as errors/warns: a missing manifested " +
      "file is an error, an unmanifested stray is a warn") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    val v = cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    val leaf = Paths.get(cat.path("pv"), s"_v$v", "dt=2024-01-01")
    // stray: a parquet file the manifest does not carry
    val stray = leaf.resolve("stray-part.parquet")
    Files.write(stray, Array[Byte](1, 2, 3))
    val r1 = cat.fsck("pv")
    assert(r1.exists(x => x._1 == "warn" && x._2 == "unmanifested_file" &&
      x._3.contains("stray-part.parquet")), r1.toString)
    Files.delete(stray)
    // hole: delete a manifested file
    import scala.jdk.CollectionConverters._
    val s = Files.list(leaf)
    val f = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally s.close()
    Files.delete(f)
    val r2 = cat.fsck("pv")
    assert(r2.exists(x => x._1 == "error" &&
      x._2 == "manifest_file_missing"), r2.toString)
  }

  test("crash residue classes report with the healing verb: stale and " +
      "committed collapse intents, orphan publish intents, orphan " +
      "branch dirs, scratch") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy("pv",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    // stale pre-commit collapse intent
    val specFile = Paths.get(cat.path("pv"), "_partspec.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(new String(Files.readAllBytes(specFile), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("collapseAt", cat.currentVersion("pv").get + 1L)
    node.put("collapsePub", "gc-dead")
    Files.write(specFile, om.writeValueAsString(node).getBytes("UTF-8"))
    val cat2 = new TableCatalog(spark,
      Paths.get(cat.path("pv")).getParent.toString)
    val r = cat2.fsck("pv")
    assert(r.exists(x => x._1 == "info" && x._2 == "collapse_intent" &&
      x._3.contains("stale")), r.toString)
    // orphan publish intent + orphan branch dir + scratch residue
    Files.write(Paths.get(cat2.path("pv"), "_brpend_ghost"),
      "{}".getBytes("UTF-8"))
    Files.createDirectories(
      Paths.get(cat2.path("pv"), "_branchdata_ghost-e1"))
    Files.createDirectories(
      Paths.get(cat2.path("pv"), "_tmp_ins-deadbeef"))
    val r2 = cat2.fsck("pv")
    assert(r2.exists(x => x._1 == "warn" && x._2 == "publish_intent"),
      r2.toString)
    assert(r2.exists(x => x._1 == "warn" && x._2 == "orphan_branch_dir"),
      r2.toString)
    assert(r2.exists(x => x._1 == "info" && x._2 == "scratch"),
      r2.toString)
    // a LIVE branch's pend reports as info, not warn
    cat2.appendToBranch("pv", "wap",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    Files.write(Paths.get(cat2.path("pv"), "_brpend_wap"),
      "{}".getBytes("UTF-8"))
    val r3 = cat2.fsck("pv")
    assert(r3.exists(x => x._1 == "info" && x._2 == "publish_intent" &&
      x._3.contains("'wap'")), r3.toString)
    Files.delete(Paths.get(cat2.path("pv"), "_brpend_wap"))
    cat2.dropBranch("pv", "wap")
  }

  test("fsck(repair = true) applies the safe healing subset: a dead-" +
      "branch publish intent folds, orphan branch dirs and scratch " +
      "sweep past the grace window, and a second fsck answers clean — " +
      "while data-loss findings stay diagnose-only (r17)") {
    val (cat, g) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    val v = cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("k", "dt"))
    // inject every sweepable residue class
    Files.write(Paths.get(cat.path("pv"), "_brpend_ghost"),
      "{}".getBytes("UTF-8"))
    Files.createDirectories(
      Paths.get(cat.path("pv"), "_branchdata_ghost-e1"))
    Files.createDirectories(Paths.get(cat.path("pv"), "_tmp_ins-dead"))
    val before = cat.fsck("pv")
    assert(before.exists(_._2 == "publish_intent"), before.toString)
    assert(before.exists(_._2 == "orphan_branch_dir"), before.toString)
    assert(before.exists(_._2 == "scratch"), before.toString)
    // repair returns the PRE-repair findings…
    val reported = cat.fsck("pv", repair = true, graceMs = 0L)
    assert(reported.map(_._2).toSet === before.map(_._2).toSet)
    // …and a re-run proves convergence, from Scala and SQL
    assert(cat.fsck("pv") === Seq.empty)
    assert(!Files.exists(Paths.get(cat.path("pv"), "_brpend_ghost")))
    assert(!Files.exists(
      Paths.get(cat.path("pv"), "_branchdata_ghost-e1")))
    assert(cat.read("pv").count() === 2L, "healing must not touch data")
    assert(spark.sql(
      s"CALL $g.system.fsck('pv', repair => true)").count() === 0L)
    // a LIVE branch's intent and staged data are NEVER touched
    cat.appendToBranch("pv", "wap", Seq((3L, "2024-01-03")).toDF("k", "dt"))
    Files.write(Paths.get(cat.path("pv"), "_brpend_wap"),
      "{}".getBytes("UTF-8"))
    cat.fsck("pv", repair = true, graceMs = 0L)
    assert(Files.exists(Paths.get(cat.path("pv"), "_brpend_wap")),
      "a live branch's publish intent is the recovery path's, not ours")
    assert(cat.readBranch("pv", "wap").count() === 3L)
    Files.delete(Paths.get(cat.path("pv"), "_brpend_wap"))
    cat.dropBranch("pv", "wap")
    // data-loss findings survive repair untouched: a manifest hole is
    // a human decision, not a sweep
    val leaf = Paths.get(cat.path("pv"), s"_v$v", "dt=2024-01-01")
    import scala.jdk.CollectionConverters._
    val s = Files.list(leaf)
    val f = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally s.close()
    Files.delete(f)
    val after = cat.fsck("pv", repair = true, graceMs = 0L)
    assert(after.exists(x => x._1 == "error" &&
      x._2 == "manifest_file_missing"), after.toString)
    assert(cat.fsck("pv").exists(_._2 == "manifest_file_missing"),
      "repair must not 'heal' a data hole")
  }

  test("fsck(repair = true) finishes a committed-but-unfinalized " +
      "generation compaction: the collapse intent converges to the " +
      "finalize sidecar and the view stays correct throughout") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("cc",
      Seq((0L, 0L, 0, 0)).toDF("k", "v", "y", "m").schema, Seq("y"))
    cat.appendPartitionedVersioned("cc",
      Seq((1L, 10L, 2020, 1), (2L, 20L, 2021, 2)).toDF("k", "v", "y", "m"))
    cat.repartitionTableLazy("cc",
      Seq(("identity", "y", 0), ("identity", "m", 0)))
    cat.appendPartitionedVersioned("cc",
      Seq((3L, 30L, 2021, 3)).toDF("k", "v", "y", "m"))
    val specFile = Paths.get(cat.path("cc"), "_partspec.json")
    val multiGenSpec = new String(Files.readAllBytes(specFile), "UTF-8")
    val v = cat.compactGenerationsVersioned("cc")
    // recover the compaction commit's provenance from history
    val pubs = {
      val hd = Paths.get(cat.path("cc"), "_history")
      import scala.jdk.CollectionConverters._
      val st = Files.list(hd)
      try st.iterator().asScala
        .flatMap(p => new String(Files.readAllBytes(p), "UTF-8")
          .linesIterator)
        .flatMap { l =>
          """"version":(\d+).*?"pub":"([^"]+)"""".r.findFirstMatchIn(l)
            .map(x => x.group(1).toLong -> x.group(2))
        }.toMap
      finally st.close()
    }
    // simulate the crash window: pre-collapse sidecar + the intent,
    // the finalize never landed
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(multiGenSpec)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.put("collapseAt", v)
    node.put("collapsePub", pubs(v))
    Files.write(specFile, om.writeValueAsString(node).getBytes("UTF-8"))
    val cat2 = new TableCatalog(spark,
      Paths.get(cat.path("cc")).getParent.toString)
    val r = cat2.fsck("cc")
    assert(r.exists(x => x._1 == "warn" && x._2 == "collapse_intent" &&
      x._3.contains("committed")), r.toString)
    cat2.fsck("cc", repair = true, graceMs = 0L)
    assert(cat2.fsck("cc") === Seq.empty, "repair must converge")
    assert(!new String(Files.readAllBytes(specFile), "UTF-8")
      .contains("collapseAt"), "the finalize sidecar must have landed")
    assert(cat2.read("cc").select("k").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L))
  }

  test("fsck mid-crash-window never misclassifies (r17 adversarial " +
      "probe): a LIVE branch's publish intent reads info in BOTH the " +
      "pend→commit and commit→consume windows, repair never touches " +
      "it, and the recovery after stays exactly-once") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    cat.appendToBranch("pv", "wap", Seq((2L, "2024-01-02")).toDF("k", "dt"))
    // window 1: between the write-ahead intent and the commit
    var inPend: Seq[(String, String, String)] = Seq.empty
    // window 2: between the commit and the record/consume
    var inCommit: Seq[(String, String, String)] = Seq.empty
    cat.publishBranchHooked("pv", "wap",
      afterPend = () => { inPend = cat.fsck("pv") },
      afterCommit = () => { inCommit = cat.fsck("pv") })
    def intent(rs: Seq[(String, String, String)]) =
      rs.filter(_._2 == "publish_intent")
    assert(intent(inPend).nonEmpty && intent(inPend).forall(_._1 == "info"),
      s"pend→commit: a live branch's intent must read info: $inPend")
    assert(intent(inCommit).nonEmpty &&
      intent(inCommit).forall(_._1 == "info"),
      s"commit→consume: still the live branch's intent: $inCommit")
    assert(cat.fsck("pv") === Seq.empty, "post-publish: clean")
    // now the REAL crash: commit lands, consume never runs — a
    // mid-window repair must leave the intent for the recovery path,
    // and the recovery must stay exactly-once after it
    cat.appendToBranch("pv", "wap2", Seq((3L, "2024-01-03")).toDF("k", "dt"))
    intercept[RuntimeException](
      cat.publishBranchHooked("pv", "wap2",
        afterPend = () => (),
        afterCommit = () => throw new RuntimeException("crash")))
    cat.fsck("pv", repair = true, graceMs = 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.path("pv"), "_brpend_wap2")),
      "repair must never fold a LIVE branch's committed intent")
    val v = cat.currentVersion("pv").get
    cat.publishBranch("pv", "wap2") // the recovery path
    assert(cat.currentVersion("pv") === Some(v),
      "recovery after a mid-window repair must not double-publish")
    assert(cat.read("pv").filter($"k" === 3L).count() === 1L,
      "the branch's rows must exist exactly once")
    assert(cat.fsck("pv") === Seq.empty)
  }

  test("fsckAll sweeps the whole catalog (r17): per-table findings " +
      "tagged by table, a sick table reports instead of aborting the " +
      "fleet pass, repair heals everything healable, from Scala and SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("clean", Seq((1L, 1)).toDF("k", "v"))
    cat.createPartitionedVersioned("dirty",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("dirty",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    Files.createDirectories(
      Paths.get(cat.path("dirty"), "_branchdata_ghost-e1"))
    Files.write(Paths.get(cat.path("dirty"), "_brpend_ghost"),
      "{}".getBytes("UTF-8"))
    val sweep = cat.fsckAll()
    assert(sweep.forall(_._1 == "dirty"),
      s"only the dirty table may report: $sweep")
    assert(sweep.exists(_._3 == "orphan_branch_dir"), sweep.toString)
    assert(sweep.exists(_._3 == "publish_intent"), sweep.toString)
    assert(spark.sql(s"CALL $g.system.fsck_all()").count() ===
      sweep.size.toLong)
    cat.fsckAll(repair = true, graceMs = 0L)
    assert(cat.fsckAll() === Seq.empty, "the fleet repair must converge")
    assert(spark.sql(s"CALL $g.system.fsck_all(repair => true)")
      .count() === 0L)
    assert(cat.read("clean").count() === 1L)
    assert(cat.read("dirty").count() === 1L)
  }

  test("fsck_all(repair = true) racing a LIVE publisher across TWO " +
      "tables (r18 adversarial probe): the fleet pass inside both " +
      "publish crash windows must heal only the healable on the " +
      "OTHER table, never fold the live intent, and the publish " +
      "stays exactly-once") {
    val (cat, _) = freshSqlCat()
    // table A: the publisher mid-flight
    cat.createPartitionedVersioned("pa",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pa",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    cat.appendToBranch("pa", "wap", Seq((2L, "2024-01-02")).toDF("k", "dt"))
    // table B: healthy but carrying healable residue the fleet pass
    // must still repair while A is mid-window
    cat.createPartitionedVersioned("pb",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pb",
      Seq((9L, "2024-02-01")).toDF("k", "dt"))
    Files.createDirectories(
      Paths.get(cat.path("pb"), "_branchdata_ghost-e1"))
    val vb = cat.currentVersion("pb").get
    var sweepPend: Seq[(String, String, String, String)] = Seq.empty
    var sweepCommit: Seq[(String, String, String, String)] = Seq.empty
    cat.publishBranchHooked("pa", "wap",
      afterPend = () => {
        sweepPend = cat.fsckAll(repair = true, graceMs = 0L)
      },
      afterCommit = () => {
        sweepCommit = cat.fsckAll(repair = true, graceMs = 0L)
      })
    // the fleet pass inside window 1 saw A's live intent as info and
    // healed B's orphan dir; inside window 2 the same — per-table
    // locks never interleaved into a misclassification
    def of(t: String, rs: Seq[(String, String, String, String)]) =
      rs.filter(_._1 == t)
    assert(of("pa", sweepPend).forall(_._2 == "info"),
      s"window 1: A's live publish state must read info: $sweepPend")
    assert(of("pa", sweepCommit).forall(_._2 == "info"),
      s"window 2: A's live publish state must read info: $sweepCommit")
    assert(of("pb", sweepPend).exists(_._3 == "orphan_branch_dir") ||
      !Files.exists(Paths.get(cat.path("pb"), "_branchdata_ghost-e1")),
      "the fleet pass must still judge B while A is mid-window")
    // exactly-once: the publish completed despite two mid-window
    // fleet repairs; B's version never moved
    assert(cat.read("pa").filter($"k" === 2L).count() === 1L)
    assert(cat.currentVersion("pb") === Some(vb),
      "the fleet repair must never commit anything on a healthy table")
    assert(cat.read("pb").count() === 1L)
    assert(cat.fsckAll() === Seq.empty, "the fleet converges clean")
  }

  test("compaction advisor (r18): row-level DML on a multi-generation " +
      "table accumulates its rewrite cost; once it exceeds one full " +
      "table pass, fsck advises CALL system.repartition and " +
      "describe_detail carries the counters; compaction retires both") {
    val (cat, g) = freshSqlCat()
    spark.sql(s"CREATE TABLE $g.amp (k BIGINT, v BIGINT, y INT) " +
      "PARTITIONED BY (y) TBLPROPERTIES ('versioned'='true')")
    cat.appendPartitionedVersioned("amp",
      Seq((1L, 10L, 2020), (2L, 20L, 2021)).toDF("k", "v", "y"))
    cat.repartitionTableLazy("amp",
      Seq(("identity", "y", 0), ("bucket", "k", 2)))
    cat.appendPartitionedVersioned("amp",
      Seq((3L, 30L, 2021)).toDF("k", "v", "y"))
    assert(cat.detail("amp").dmlStatements === 0L)
    assert(cat.fsck("amp") === Seq.empty, "healthy, no advice yet")
    // two whole-table-posture statements (data-column predicates):
    // each rewrites every live leaf, so the accumulated cost provably
    // clears one full pass of the table
    spark.sql(s"UPDATE $g.amp SET v = v + 1 WHERE k % 2 = 0")
    spark.sql(s"UPDATE $g.amp SET v = v + 1 WHERE k % 2 = 1")
    val d = cat.detail("amp")
    assert(d.dmlStatements === 2L)
    assert(d.dmlRewrittenBytes > d.bytes,
      s"two full rewrites must exceed one live pass " +
        s"(${d.dmlRewrittenBytes} vs ${d.bytes})")
    val advice = cat.fsck("amp").filter(_._2 == "compaction_advised")
    assert(advice.nonEmpty && advice.forall(_._1 == "advice"),
      cat.fsck("amp").toString)
    // surfaced through SQL too
    assert(spark.sql(s"CALL $g.system.describe_detail('amp')")
      .select("dml_statements").head().getLong(0) === 2L)
    assert(spark.sql(s"CALL $g.system.fsck('amp')")
      .filter(col("check") === "compaction_advised").count() === 1L)
    // following the advice retires it
    cat.compactGenerationsVersioned("amp")
    assert(cat.detail("amp").dmlStatements === 0L)
    assert(cat.fsck("amp") === Seq.empty, "compacted: clean, no advice")
    assert(cat.read("amp").select("v").as[Long].collect().sorted.toSeq ===
      Seq(11L, 21L, 31L), "the DML's values survive the whole loop")
  }

  test("fsck never mutates: the findings are identical across calls " +
      "and the table keeps serving") {
    val (cat, _) = freshSqlCat()
    cat.createPartitionedVersioned("pv",
      Seq((0L, "x")).toDF("k", "dt").schema, Seq("dt"))
    cat.appendPartitionedVersioned("pv",
      Seq((1L, "2024-01-01")).toDF("k", "dt"))
    Files.createDirectories(Paths.get(cat.path("pv"), "_tmp_ins-x"))
    val a = cat.fsck("pv")
    val b = cat.fsck("pv")
    assert(a === b)
    assert(Files.exists(Paths.get(cat.path("pv"), "_tmp_ins-x")),
      "fsck must not clean anything (that is vacuum's job)")
    assert(cat.read("pv").count() === 1L)
  }
}
