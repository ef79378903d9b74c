package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, udf}
import graft.catalog.TableCatalog
import java.nio.file.Files

/** Catalog snapshots — multi-table atomic commits: commitAll lands each
  * table's own versioned commit, then one catalog-version pointer pins
  * them all; readConsistent resolves through the pins, so cross-table
  * readers see all-old or all-new, never a mix, and the pins hold the
  * referenced snapshots against the retention sweep. */
class TxnSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("commitAll flips consistent readers atomically; bare reads move per table") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txn").toString)
    val c1 = cat.commitAll(replace = Seq(
      "fact" -> Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      "dim" -> Seq((1L, "a"), (2L, "b")).toDF("k", "s")))
    assert(c1 === 1L && cat.catalogVersion.contains(1L))
    assert(cat.readConsistent("fact").count() === 2L)
    assert(cat.readConsistent("dim").count() === 2L)
    // a SINGLE-table commit outside the txn: the bare pointer moves,
    // the consistent view stays pinned — no fact-from-today joined to
    // dim-from-yesterday for readers who opt into the snapshot
    cat.replaceAtomic("fact", Seq((1L, 11L), (2L, 21L), (3L, 31L)).toDF("k", "v"))
    assert(cat.read("fact").count() === 3L)
    assert(cat.readConsistent("fact").count() === 2L)
    // the next txn touches only fact; dim's pin carries forward
    val c2 = cat.commitAll(replace = Seq(
      "fact" -> Seq((9L, 90L)).toDF("k", "v")))
    assert(c2 === 2L)
    assert(cat.readConsistent("fact").count() === 1L)
    assert(cat.readConsistent("dim").count() === 2L)
    // catalog-level time travel: generation 1 still resolves both
    assert(cat.readConsistentAt("fact", 1L).count() === 2L)
    assert(cat.readConsistentAt("dim", 1L).count() === 2L)
  }

  test("pins hold the snapshot against an aggressive retention sweep") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("txn0").toString, snapshotRetentionMs = 0L)
    cat.commitAll(replace = Seq("t" -> Seq((1L, 1L)).toDF("k", "v")))
    val pinned = cat.catalogPins(cat.catalogVersion.get)("t")
    // several single-table commits; retention-0 prunes every unpinned
    // old snapshot immediately
    (0 until 3).foreach(i =>
      cat.replaceAtomic("t", Seq((i.toLong, i.toLong)).toDF("k", "v")))
    // the bare old versions are gone, the PINNED one is readable
    assert(cat.readConsistent("t").count() === 1L)
    assert(cat.readVersion("t", pinned).collect().toSeq.nonEmpty)
    // moving the catalog forward un-pins the old generation; after one
    // more commit's sweep the version ages out like any other
    cat.commitAll(replace = Seq("t" -> Seq((7L, 7L)).toDF("k", "v")))
    cat.replaceAtomic("t", Seq((8L, 8L)).toDF("k", "v"))
    assertThrows[Exception](cat.readVersion("t", pinned).collect())
  }

  test("a partial txn (crash before the pointer) leaves the old snapshot consistent") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txnc").toString)
    cat.commitAll(replace = Seq(
      "a" -> Seq((1L, 1L)).toDF("k", "v"),
      "b" -> Seq((1L, 1L)).toDF("k", "v")))
    // simulate a txn that died after landing table a but before the
    // catalog pointer: a single-table commit IS that state
    cat.replaceAtomic("a", Seq((2L, 2L), (3L, 3L)).toDF("k", "v"))
    assert(cat.readConsistent("a").count() === 1L)
    assert(cat.readConsistent("b").count() === 1L)
    // the retry re-lands both tables and flips the snapshot
    cat.commitAll(replace = Seq(
      "a" -> Seq((2L, 2L), (3L, 3L)).toDF("k", "v"),
      "b" -> Seq((2L, 2L)).toDF("k", "v")))
    assert(cat.readConsistent("a").count() === 2L)
    assert(cat.readConsistent("b").count() === 1L)
  }

  test("the c<N> SQL namespace reads a whole generation consistently") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txns").toString)
    val c1 = cat.commitAll(replace = Seq(
      "fact" -> Seq((1L, 10L)).toDF("k", "v"),
      "dim" -> Seq((1L, "a")).toDF("k", "s")))
    cat.replaceAtomic("fact", Seq((1L, 99L), (2L, 98L)).toDF("k", "v"))
    val g = "gns" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", cat.root)
    // bare name = moved pointer; c1 namespace = the pinned generation
    assert(spark.sql(s"SELECT count(*) FROM $g.fact").as[Long].head() === 2L)
    assert(spark.sql(
      s"""SELECT f.v, d.s FROM $g.c$c1.fact f
         |JOIN $g.c$c1.dim d ON f.k = d.k""".stripMargin)
      .as[(Long, String)].collect().toSeq === Seq((10L, "a")))
    assert(spark.sql(s"SHOW TABLES IN $g.c$c1").count() === 2L)
    // a generation read is time travel: INSERT refuses in analysis
    assertThrows[Exception](
      spark.sql(s"INSERT INTO $g.c$c1.fact VALUES (9, 9)"))
    // unknown generation / table not in the generation are loud
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $g.c99.fact").collect())
  }

  test("vacuumCatalog sweeps crashed-txn residue, never the live generation") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txnv").toString)
    cat.commitAll(replace = Seq("t" -> Seq((1L, 1L)).toDF("k", "v")))
    cat.commitAll(replace = Seq("t" -> Seq((2L, 2L)).toDF("k", "v")))
    // fabricate the documented residue: a crashed txn's orphan pin (a
    // generation that never committed) and a catalog write-aside
    Files.write(java.nio.file.Paths.get(cat.path("t"), "_tag_cpin_99"),
      "1".getBytes)
    Files.write(java.nio.file.Paths.get(cat.root, "_catalog", "_tmp_junk"),
      "x".getBytes)
    val swept = cat.vacuumCatalog(graceMs = 0L).map(r => r._1 -> r._2).toMap
    assert(cat.vacuumCatalog(graceMs = 0L).isEmpty) // second run: clean
    assert(swept.getOrElse("orphan_pin", 0L) >= 1L)
    assert(swept.getOrElse("write_aside", 0L) >= 1L)
    assert(swept.getOrElse("superseded_snapshot", 0L) >= 1L) // c1.json aged out
    // the live generation still resolves; generation 1 is now gone
    assert(cat.readConsistent("t").count() === 1L)
    assertThrows[IllegalArgumentException](cat.readConsistentAt("t", 1L))
  }

  test("drop removes a pin; a vanished carried table never wedges; junk cpin tags survive") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txnd").toString)
    cat.commitAll(replace = Seq(
      "keep" -> Seq((1L, 1L)).toDF("k", "v"),
      "gone" -> Seq((2L, 2L)).toDF("k", "v"),
      "dropme" -> Seq((3L, 3L)).toDF("k", "v")))
    // a user tag that merely LOOKS like a pin must not crash the sweep
    Files.write(java.nio.file.Paths.get(cat.path("keep"), "_tag_cpin_"),
      "1".getBytes)
    cat.vacuumCatalog(graceMs = 0L) // would have thrown NumberFormatException
    // out-of-band removal of a carried table (no drop verb was used)
    TableCatalog.deleteRecursively(java.nio.file.Paths.get(cat.path("gone")))
    val c2 = cat.commitAll(
      replace = Seq("keep" -> Seq((9L, 9L)).toDF("k", "v")),
      drop = Seq("dropme"))
    val pins = cat.catalogPins(c2)
    assert(pins.keySet === Set("keep"), s"got $pins")
    assert(cat.readConsistent("keep").count() === 1L)
    assertThrows[IllegalArgumentException](
      cat.commitAll(Seq("t" -> Seq((1L, 1L)).toDF("k", "v")), drop = Seq("t")))
  }

  test("member data writes stage OUTSIDE the catalog lock; a mid-stage commit survives") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txn").toString)
    cat.commitAll(replace = Seq("t" -> Seq((1L, 1L)).toDF("k", "v")))
    val lockFile = java.nio.file.Paths.get(cat.root, "_catalog", "_writer.lock")
    // the probe runs INSIDE the member's staging write: in local mode
    // the task shares the JVM, so observing the catalog lock file held
    // during evaluation would prove the r10 shape (lock around the
    // data writes) is back
    TxnSpec.lockSeenDuringStage.set(false)
    TxnSpec.probedRows.set(0)
    val lockPath = lockFile.toString
    val probe = udf((k: Long) => {
      TxnSpec.probedRows.incrementAndGet()
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(lockPath)))
        TxnSpec.lockSeenDuringStage.set(true)
      k
    })
    val c = cat.commitAll(
      replace = Seq("t" ->
        Seq((5L, 50L), (6L, 60L)).toDF("k", "v")
          .withColumn("k", probe(col("k")))),
      append = Seq("t2" -> Seq((7L, 70L)).toDF("k", "v")))
    assert(TxnSpec.probedRows.get() > 0, "the probe never evaluated")
    assert(!TxnSpec.lockSeenDuringStage.get(),
      "the catalog lock was HELD during a member's data write — " +
        "staging must happen before the lock")
    assert(cat.catalogVersion.contains(c))
    assert(cat.readConsistent("t").orderBy("k").as[(Long, Long)]
      .collect().toSeq === Seq((5L, 50L), (6L, 60L)))
    assert(cat.readConsistent("t2").as[(Long, Long)].head() === ((7L, 70L)))
    // a commit landing BETWEEN staging and the lock: simulate by
    // staging against a version that then moves — the member falls back
    // to the inline locked write and nothing is lost (exercised via a
    // replace whose table is rewritten concurrently in the same JVM by
    // the staging itself being stale: here we just re-run a txn after
    // an out-of-band commit and assert convergence)
    cat.replaceAtomic("t", Seq((8L, 80L)).toDF("k", "v"))
    cat.commitAll(replace = Seq("t" -> Seq((9L, 90L)).toDF("k", "v")))
    assert(cat.readConsistent("t").as[(Long, Long)].head() === ((9L, 90L)))
    // no staging residue
    val leftovers = java.nio.file.Files.list(
      java.nio.file.Paths.get(cat.path("t")))
    try {
      import scala.jdk.CollectionConverters._
      assert(!leftovers.iterator().asScala
        .exists(_.getFileName.toString.startsWith("_tmp_txn-")))
    } finally leftovers.close()
  }

  test("bad inputs are loud") {
    val cat = new TableCatalog(spark, Files.createTempDirectory("txne").toString)
    assertThrows[IllegalStateException](cat.readConsistent("t"))
    assertThrows[IllegalArgumentException](cat.commitAll(Seq.empty))
    assertThrows[IllegalArgumentException](cat.commitAll(Seq(
      "t" -> Seq((1L, 1L)).toDF("k", "v"),
      "t" -> Seq((2L, 2L)).toDF("k", "v"))))
    cat.commitAll(replace = Seq("t" -> Seq((1L, 1L)).toDF("k", "v")))
    assertThrows[IllegalArgumentException](cat.readConsistent("ghost"))
    assertThrows[IllegalArgumentException](cat.readConsistentAt("t", 99L))
  }
  test("a PARTITIONED VERSIONED member commits inside the txn: the pv " +
      "fact and its flat dim flip together; catalog time travel " +
      "reaches the pv snapshot; pins survive retention") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("txnpv").toString)
    cat.createPartitionedVersioned("fact",
      Seq((0L, 0L, "x")).toDF("k", "v", "dt").schema, Seq("dt"))
    // txn 1: pv append + flat dim replace, one catalog flip
    val c1 = cat.commitAll(
      replace = Seq("dim" -> Seq((1L, "a")).toDF("k", "s")),
      append = Seq("fact" ->
        Seq((1L, 10L, "2024-01-01"), (2L, 20L, "2024-01-02"))
          .toDF("k", "v", "dt")))
    assert(cat.readConsistent("fact").count() === 2L)
    assert(cat.readConsistent("dim").count() === 1L)
    // the member landed as a REAL pv snapshot: leaf tree, leaf pruning
    assert(cat.read("fact").filter(col("dt") === "2024-01-02")
      .count() === 1L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      cat.path("fact"), s"_v${cat.currentVersion("fact").get}",
      "dt=2024-01-01")))
    // txn 2: another pv append + dim change; consistent readers flip
    cat.commitAll(
      replace = Seq("dim" -> Seq((1L, "b")).toDF("k", "s")),
      append = Seq("fact" ->
        Seq((3L, 30L, "2024-01-02")).toDF("k", "v", "dt")))
    assert(cat.readConsistent("fact").count() === 3L)
    assert(cat.readConsistent("dim").select("s").as[String]
      .head() === "b")
    // catalog time travel reaches the OLD pv snapshot + old dim pair
    assert(cat.readConsistentAt("fact", c1).count() === 2L)
    assert(cat.readConsistentAt("dim", c1).select("s").as[String]
      .head() === "a")
    // a pv REPLACE member starts the snapshot empty
    cat.commitAll(replace = Seq("fact" ->
      Seq((9L, 90L, "2024-02-01")).toDF("k", "v", "dt")))
    assert(cat.readConsistent("fact").select("k").as[Long]
      .collect().toSeq === Seq(9L))
    assert(cat.read("fact").count() === 1L)
    // time travel within the catalog still serves the pre-replace fact
    assert(cat.readConsistentAt("fact", c1).count() === 2L)
  }

}

object TxnSpec {
  // shared with executor tasks (local mode: same JVM) by the
  // stage-outside-the-lock probe
  val lockSeenDuringStage = new java.util.concurrent.atomic.AtomicBoolean(false)
  val probedRows = new java.util.concurrent.atomic.AtomicInteger(0)
}
