package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** The Bloom half of data skipping: a point probe on a hash-scattered
  * layout — where every file's min/max envelope spans the whole domain
  * and range pruning keeps everything — must open only the file(s)
  * that can contain the value (false positives bounded by the filter
  * sizing, false negatives impossible), and the pruned read must equal
  * the unpruned filter bit for bit. */
class BloomSkippingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // one row per id, round-robin scattered: a probed id lives in EXACTLY
  // one of the 16 files, so (kept - 1) counts false positives directly —
  // and every file's min/max id envelope spans ~the whole domain, the
  // layout where range pruning keeps everything
  private def table = (0 until 10000)
    .map(i => (i.toLong, s"u$i", i.toLong % 7)).toDF("id", "name", "grp")
    .repartition(16)

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("bloom-cat").toString)

  test("point read equals the unpruned filter and skips nearly all files") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id", "name"))
    val total = cat.fileEnvelopes("t").size
    assert(total === 16)

    val kept = cat.pointKeepFiles("t", Seq(("id", 777L)))
    assert(kept.nonEmpty && kept.size <= 3,
      s"expected ~1 of $total files, kept ${kept.size}")

    val pruned = cat.prunedReadPoint("t", Seq(("id", 777L)))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(pruned === Set((777L, "u777")))
  }

  test("string probes prune too, and multi-probe is a conjunction") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id", "name"))
    val byName = cat.prunedReadPoint("t", Seq(("name", "u4242")))
      .select("id").as[Long].collect().toSet
    assert(byName === Set(4242L))
    // conjunction of two probes that no single row satisfies
    val cross = cat.prunedReadPoint("t", Seq(("id", 1L), ("name", "u2")))
    assert(cross.count() === 0L)
  }

  test("an absent value keeps ~no files and returns empty") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id"))
    val kept = cat.pointKeepFiles("t", Seq(("id", -123456789L)))
    assert(kept.size <= 2, s"absent value kept ${kept.size} files")
    assert(cat.prunedReadPoint("t", Seq(("id", -123456789L))).count() === 0L)
  }

  test("a table mutated behind its index refuses to answer") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id"))
    // an out-of-band writer the catalog never saw: duplicate a data
    // file on disk (catalog verbs like append() invalidate the sidecar
    // themselves — this is the residual class only the file-set
    // equality check catches)
    val dir = java.nio.file.Paths.get(cat.path("t"))
    val part = Files.list(dir).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, dir.resolve("part-rogue.parquet"))
    val e = intercept[IllegalArgumentException] {
      cat.prunedReadPoint("t", Seq(("id", 777L)))
    }
    assert(e.getMessage.contains("stale"))
  }

  test("appendIndexed extends the bloom index over only the new files") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id", "name"))
    val day2 = (20000 until 21000)
      .map(i => (i.toLong, s"u$i", i.toLong % 7)).toDF("id", "name", "grp")
      .repartition(4)
    cat.appendIndexed("t", day2, skipCols = Seq.empty)
    assert(cat.fileEnvelopes("t").size === 20)
    // the bitsets live as per-file _bloom/ sidecars: one per data file
    // (16 from the full ANALYZE + 4 from the append) — never inside
    // _stats.json, and never merged into one driver-side blob
    import scala.jdk.CollectionConverters._
    val legStream = Files.list(java.nio.file.Paths.get(cat.path("t"), "_bloom"))
    val legs =
      try legStream.iterator().asScala.map(_.getFileName.toString).toSeq
      finally legStream.close()
    assert(legs.count(_.startsWith("f-")) === 20)

    // a value reachable only through the appended files' filters
    val hit = cat.prunedReadPoint("t", Seq(("id", 20500L)))
      .select("name").as[String].collect().toSet
    assert(hit === Set("u20500"))
    val kept = cat.pointKeepFiles("t", Seq(("id", 20500L)))
    assert(kept.size <= 3, s"day-2 probe kept ${kept.size} of 20 files")
    // day-1 values still resolve through the original filters
    assert(cat.prunedReadPoint("t", Seq(("id", 777L))).count() === 1L)
  }

  test("the stats sidecar stays small; a vanished leg is loud, not lossy") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id", "name"))
    // planning-path stats() must never pay for filter bytes: the
    // sidecar holds rows/envelopes only, the bitsets live in _bloom/
    val statsBytes = Files.size(
      java.nio.file.Paths.get(cat.path("t"), "_stats.json"))
    val legBytes = {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(java.nio.file.Paths.get(cat.path("t"), "_bloom"))
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
      finally s.close()
    }
    assert(statsBytes < 20000, s"stats sidecar carries $statsBytes bytes")
    assert(legBytes > statsBytes, "bitsets missing from the legs")
    // an incomplete index (manual deletion, half-written legs) must
    // refuse — dropping the unfiltered file would silently lose rows
    TableCatalog.deleteRecursively(
      java.nio.file.Paths.get(cat.path("t"), "_bloom"))
    val e = intercept[IllegalStateException] {
      cat.prunedReadPoint("t", Seq(("id", 777L)))
    }
    assert(e.getMessage.contains("incomplete"))
  }

  test("a rebuild caught between new-sidecars-landed and old-deleted still answers") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id"))
    // simulate the crash window: a superseded sidecar (dead data file)
    // is still present beside the fresh ones — probes look up by
    // candidate file name and never scan the directory, so the orphan
    // is unreachable, not a wrong answer
    val dir = java.nio.file.Paths.get(cat.path("t"), "_bloom")
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val leg = try s.iterator().asScala.next() finally s.close()
    Files.copy(leg, dir.resolve(
      "f-00000000000000000000000000000000deadbeef.json"))
    val hit = cat.prunedReadPoint("t", Seq(("id", 777L)))
      .select("name").as[String].collect().toSet
    assert(hit === Set("u777"))
  }

  test("probe IO is O(candidates) and cached — never O(table files)") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id"))
    val p0 = TableCatalog.bloomSidecarParses.get()
    assert(cat.pointKeepFiles("t", Seq(("id", 777L))).nonEmpty)
    val cold = TableCatalog.bloomSidecarParses.get() - p0
    assert(cold <= 16, s"cold probe parsed $cold sidecars for 16 files")
    // warm probes parse NOTHING — one parse per sidecar per fingerprint
    // change, however many probes run
    val p1 = TableCatalog.bloomSidecarParses.get()
    cat.pointKeepFiles("t", Seq(("id", 778L)))
    cat.pointKeepFiles("t", Seq(("id", 9999L)))
    cat.pointKeepFiles("t", Seq(("id", -5L)))
    assert(TableCatalog.bloomSidecarParses.get() === p1,
      "a warm probe re-parsed an unchanged sidecar")
    // appended files cost only THEIR sidecars; day-1 entries stay cached
    val day2 = (20000 until 21000)
      .map(i => (i.toLong, s"u$i", i.toLong % 7)).toDF("id", "name", "grp")
      .repartition(4)
    cat.appendIndexed("t", day2, skipCols = Seq.empty)
    val p2 = TableCatalog.bloomSidecarParses.get()
    assert(cat.prunedReadPoint("t", Seq(("id", 20500L))).count() === 1L)
    val delta = TableCatalog.bloomSidecarParses.get() - p2
    assert(delta <= 4, s"probe after append parsed $delta (> the 4 new files)")
  }

  test("an envelope-pruned file's sidecar is never read, even cold") {
    val cat = freshCat()
    // range-clustered AND bloomed on id: the min/max envelope already
    // names the one candidate file, so the probe's sidecar IO is
    // O(candidates) on the FIRST touch — independent of the other 15
    cat.overwriteIndexed("t",
      (0 until 10000).map(i => (i.toLong, s"u$i", i.toLong % 7))
        .toDF("id", "name", "grp").repartitionByRange(16, col("id")),
      skipCols = Seq("id"), bloomCols = Seq("id"))
    val p0 = TableCatalog.bloomSidecarParses.get()
    val kept = cat.pointKeepFiles("t", Seq(("id", 777L)))
    assert(kept.size === 1)
    val cold = TableCatalog.bloomSidecarParses.get() - p0
    assert(cold <= 2,
      s"a clustered point probe read $cold sidecars — the envelope " +
        "prefilter must bound IO to the candidate files")
    assert(cat.prunedReadPoint("t", Seq(("id", 777L))).count() === 1L)
  }

  test("probing a non-bloom column or a NULL value errors loudly") {
    val cat = freshCat()
    cat.overwriteIndexed("t", table, skipCols = Seq.empty,
      bloomCols = Seq("id"))
    assert(intercept[IllegalArgumentException] {
      cat.pointKeepFiles("t", Seq(("grp", 1L)))
    }.getMessage.contains("not a bloom column"))
    assert(intercept[IllegalArgumentException] {
      cat.pointKeepFiles("t", Seq(("id", null)))
    }.getMessage.contains("NULL"))
  }

  test("bloom composes with the min/max envelope on the same sidecar") {
    val cat = freshCat()
    // range-clustered by grp, bloomed on id: one ANALYZE feeds both
    cat.overwriteIndexed("t",
      (0 until 10000).map(i => (i.toLong, s"u$i", i.toLong % 7))
        .toDF("id", "name", "grp").repartitionByRange(8, col("id")),
      skipCols = Seq("id"), bloomCols = Seq("name"))
    val ranged = cat.prunedRead("t", Seq(("id", 100L, 199L)))
    assert(ranged.count() === 100L)
    val pointed = cat.prunedReadPoint("t", Seq(("name", "u5000")))
      .select("id").as[Long].collect().toSet
    assert(pointed === Set(5000L))
  }
}
