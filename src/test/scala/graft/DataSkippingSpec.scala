package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{DataSkipping, ZOrder}
import java.nio.file.Files

/** The manifest must never lose rows (pruned read ≡ full filter), and
  * on a z-clustered layout it must actually skip: a 2-D box probe opens
  * a small fraction of the files, where a 1-D sort prunes only its own
  * dimension. */
class DataSkippingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val grid = (0 until 4096)
    .map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong)).toDF("id", "x", "y")
  private val box = Seq(("x", 8L, 15L), ("y", 8L, 15L))

  private def keptFiles(mf: org.apache.spark.sql.DataFrame): Long =
    box.foldLeft(mf) { case (m, (c, lo, hi)) =>
      m.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }.count()

  test("pruned read equals the unpruned filter, and z-layout skips most files") {
    val dir = Files.createTempDirectory("skip-z").toString
    ZOrder.cluster(grid, "x", "y", bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val mf = DataSkipping.manifest(stored, Seq("x", "y")).cache()

    val pruned = DataSkipping.prunedRead(spark, dir, mf, box)
      .select("id").as[Long].collect().toSet
    val full = stored.filter($"x".between(8, 15) && $"y".between(8, 15))
      .select("id").as[Long].collect().toSet
    assert(pruned === full)
    assert(full.size === 64) // the 8x8 box

    val (kept, total) = (keptFiles(mf), mf.count())
    assert(total >= 8)
    // an 8x8 box on a 64x64 z-clustered grid touches ~1-2 of 16 tiles;
    // leave margin for range-boundary jitter
    assert(kept <= total / 2, s"z-layout kept $kept of $total files")
    mf.unpersist()
  }

  test("a 1-D sorted layout cannot skip on the other dimension") {
    val dir = Files.createTempDirectory("skip-lin").toString
    grid.repartitionByRange(16, $"y").sortWithinPartitions($"y")
      .write.mode("overwrite").parquet(dir)
    val mf = DataSkipping.manifest(spark.read.parquet(dir), Seq("x", "y"))
    // y prunes (its envelopes are tight), x does not (every file spans
    // the full x range) -> the box keeps every file y admits
    val keptY = mf.filter(col("max_y") >= 8 && col("min_y") <= 15).count()
    assert(keptFiles(mf) === keptY)
    val pruned = DataSkipping.prunedRead(spark, dir, mf, box)
      .select("id").as[Long].collect().toSet
    assert(pruned.size === 64) // correctness holds regardless of layout
  }

  test("a box outside the data keeps zero files and returns empty") {
    val dir = Files.createTempDirectory("skip-empty").toString
    grid.write.mode("overwrite").parquet(dir)
    val mf = DataSkipping.manifest(spark.read.parquet(dir), Seq("x", "y"))
    val out = DataSkipping.prunedRead(spark, dir, mf,
      Seq(("x", 100L, 200L), ("y", 0L, 63L)))
    assert(out.count() === 0L)
  }

  test("optimizeZOrder: versioned rewrite keeps contents, box probes skip files") {
    import graft.catalog.TableCatalog
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("skip-opt").toString)
    // seed SCATTERED through the versioned path (hash layout: every
    // file spans the whole grid, nothing prunable)
    cat.replaceAtomic("t", grid.repartition(16))
    val before = cat.read("t").collect().map(_.toSeq).toSet
    val st = cat.optimizeZOrder("t", Seq("x", "y"), bits = 6,
      numPartitions = 16)
    assert(cat.currentVersion("t") === Some(2L),
      "OPTIMIZE must be an ordinary versioned commit")
    assert(st.rows === 4096L && st.skipCols === Seq("x", "y"))
    val after = cat.read("t")
    assert(after.columns.toSeq === Seq("id", "x", "y"),
      "curve helper columns must not leak into the schema")
    assert(after.collect().map(_.toSeq).toSet === before,
      "OPTIMIZE changes layout, never contents")
    val pruned = cat.prunedRead("t", box)
    assert(pruned.select("id").as[Long].collect().toSet ===
      grid.filter($"x".between(8, 15) && $"y".between(8, 15))
        .select("id").as[Long].collect().toSet)
    val (kept, total) =
      (pruned.inputFiles.length, after.inputFiles.length)
    assert(total >= 8, s"expected ~16 files, got $total")
    assert(kept <= total / 2,
      s"post-OPTIMIZE box probe kept $kept of $total files")
  }

  test("compactSmallFiles: versioned repack, contents kept, index rebuilt") {
    import graft.catalog.TableCatalog
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("skip-compact").toString)
    cat.replaceAtomic("t", grid.repartition(64))
    assert(cat.read("t").inputFiles.length >= 32, "seed must be fragmented")
    // skip-indexed BEFORE compaction: the verb must rebuild the manifest
    cat.analyze("t", cols = Seq("x", "y"), skipCols = Seq("x", "y"))
    val before = cat.read("t").collect().map(_.toSeq).toSet
    val n = cat.compactSmallFiles("t", targetBytes = 1L << 30)
    assert(n === 1, s"one ~1GB target file expected, got $n")
    assert(cat.currentVersion("t") === Some(2L))
    assert(cat.read("t").inputFiles.length === 1)
    assert(cat.read("t").collect().map(_.toSeq).toSet === before)
    // prunedRead works against the POST-compaction manifest (a stale
    // manifest would fail its file-set freshness check loudly)
    val pruned = cat.prunedRead("t", box)
    assert(pruned.count() ===
      grid.filter($"x".between(8, 15) && $"y".between(8, 15)).count())
  }

  test("string skip columns prune by native envelopes, no surrogate") {
    import graft.catalog.TableCatalog
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("skip-str").toString)
    // a layout range-clustered by a string key — the URL-prefix shape
    val docs = (0 until 4000)
      .map(i => (f"k$i%04d", i.toLong)).toDF("sk", "v")
    cat.overwriteIndexed("t",
      docs.repartitionByRange(16, col("sk")), Seq("sk", "v"))
    val pruned = cat.prunedReadRanges("t", Seq.empty,
      Seq(("sk", "k0100", "k0399")))
    // correctness: pruned ≡ the full filter
    assert(pruned.select("sk").as[String].collect().sorted.toSeq ===
      (100 until 400).map(i => f"k$i%04d"))
    // and it actually skipped: 300/4000 keys over 16 range files
    val opened = pruned.inputFiles.length
    val total = cat.read("t").inputFiles.length
    assert(opened <= 3 && total >= 12,
      s"string envelope did not prune: opened $opened of $total")
    // mixed numeric + string probes compose
    val both = cat.prunedReadRanges("t", Seq(("v", 150L, 250L)),
      Seq(("sk", "k0100", "k0399")))
    assert(both.count() === 101L)
    // appendIndexed extends the manifest with string envelopes too
    cat.appendIndexed("t",
      Seq(("zz9999", 99999L)).toDF("sk", "v"), Seq("sk", "v"))
    val tail = cat.prunedReadRanges("t", Seq.empty, Seq(("sk", "zz", "zzz")))
    assert(tail.count() === 1L && tail.inputFiles.length === 1)
    // all-NULL string column in a file: no bound, never matches, and
    // non-BMP keys order by UTF-8 bytes (the Spark order), not UTF-16
    assert(TableCatalog.utf8Cmp("😀", "�") > 0) // 😀 > U+FFFD in UTF-8
    assert("😀".compareTo("�") < 0)             // JVM disagrees
    // a probe of the WRONG KIND is loud, never a silent empty result
    assertThrows[IllegalArgumentException](
      cat.prunedReadRanges("t", Seq(("sk", 0L, 100L)), Seq.empty))
    assertThrows[IllegalArgumentException](
      cat.prunedReadRanges("t", Seq.empty, Seq(("v", "a", "z"))))
  }

  test("TIMESTAMP skip columns probe in epoch seconds (r17): the time-" +
      "range scan — THE hot path at scale — prunes files and equals " +
      "the full filter") {
    import graft.catalog.TableCatalog
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("skip-ts").toString)
    // 40 days of events, one hour apart, range-clustered by time
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 960).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 3600L * 1000L))
    }.toDF("k", "ts")
    cat.overwriteIndexed("t",
      rows.repartitionByRange(16, col("ts")), Seq("ts", "k"))
    // probe days 10..12 by epoch-second range
    val lo = base / 1000L + 10L * 86400L
    val hi = base / 1000L + 12L * 86400L - 1L
    val pruned = cat.prunedRead("t", Seq(("ts", lo, hi)))
    val expect = rows.filter(col("ts").cast("long") >= lo &&
      col("ts").cast("long") <= hi).select("k").as[Long].collect().sorted
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      expect.toSeq)
    assert(expect.nonEmpty)
    val opened = pruned.inputFiles.length
    val total = cat.read("t").inputFiles.length
    assert(opened <= 3 && total >= 12,
      s"timestamp envelope did not prune: opened $opened of $total")
  }
}
