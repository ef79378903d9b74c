package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** The stats sidecar split (VERDICT r9 next #1): `_stats.json` is a
  * planning HEAD whose size must not grow with file count — the
  * per-file envelope array lives in `_manifest/<gen>/` legs loaded only
  * by pruning/estimate consumers, and both halves are parse-cached on
  * change fingerprints. A 100 TB table has ~800 k files; a planner that
  * re-parses an O(files) JSON per join edge is the bottleneck this
  * layout exists to remove. */
class StatsHeadSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("head-cat").toString)

  private def mk(cat: TableCatalog, name: String, files: Int): Unit =
    cat.overwriteIndexed(name,
      (0 until 20000).map(i => (i.toLong, i.toLong % 97)).toDF("id", "a")
        .repartition(files),
      skipCols = Seq("id", "a"))

  test("head size is independent of file count; envelopes scale with it") {
    val cat = freshCat()
    mk(cat, "small", 4)
    mk(cat, "big", 64)
    val sSmall = Files.size(Paths.get(cat.path("small"), "_stats.json"))
    val sBig = Files.size(Paths.get(cat.path("big"), "_stats.json"))
    // 16× the files: head differs only by digit widths (fileCount,
    // rows/ndv rendering) — bounded, never proportional
    assert(math.abs(sBig - sSmall) < 64,
      s"head grew with file count: $sSmall vs $sBig bytes")
    assert(sBig < 1024, s"planning head must stay KB-sized, got $sBig")
    assert(cat.fileEnvelopes("small").size === 4)
    assert(cat.fileEnvelopes("big").size === 64)
    assert(cat.stats("big").get.fileCount === 64L)
  }

  test("envelope legs are written by executor tasks, never a driver collect") {
    val cat = freshCat()
    // the leg writer REFUSES outside a task (TaskContext guard), so
    // analyze completing at all proves the envelopes went distributed;
    // calling it driver-side trips the guard — pinning the invariant
    // from both directions
    val e = intercept[IllegalArgumentException](
      TableCatalog.writeLegPartition("/tmp/x", "/tmp/x", Seq("id"), Seq.empty)(
        Iterator.empty))
    assert(e.getMessage.contains("executor tasks"))
    mk(cat, "t", 32)
    // the distributed write chunks per task partition: with 32 files the
    // generation holds >1 leg, and the merged envelopes are exactly the
    // per-file truth the old collect-then-render path produced
    val gen = Paths.get(cat.path("t"), "_manifest",
      cat.stats("t").get.manifestGen)
    val legs = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(gen)
      try s.iterator().asScala.count(
        _.getFileName.toString.startsWith("leg-"))
      finally s.close()
    }
    assert(legs > 1, s"expected multiple task-written legs, got $legs")
    val envs = cat.fileEnvelopes("t")
    assert(envs.size === 32)
    assert(envs.map(_.rows).sum === 20000L)
    // spot-verify one file's envelope against a direct scan of it
    val f = envs.maxBy(_.rows)
    val direct = spark.read.parquet(
      java.nio.file.Paths.get(java.net.URI.create(f.file)).toString)
      .agg(min(col("id")), max(col("id")), count(lit(1)))
      .head()
    assert(f.min("id") === direct.getLong(0))
    assert(f.max("id") === direct.getLong(1))
    assert(f.rows === direct.getLong(2))
  }

  test("pruning answers identically through the split sidecar") {
    val cat = freshCat()
    val df = (1L to 8000L).map(i => (i, i % 100)).toDF("id", "a")
    cat.overwriteIndexed("t", df.repartitionByRange(8, col("id")), Seq("id"))
    val pruned = cat.prunedRead("t", Seq(("id", 100L, 220L)))
    assert(pruned.inputFiles.length < 8, "range probe must actually prune")
    assert(pruned.as[(Long, Long)].collect().toSet
      === (100L to 220L).map(i => (i, i % 100)).toSet)
  }

  test("a vanished manifest generation is loud, never lossy") {
    val cat = freshCat()
    mk(cat, "t", 4)
    val gen = cat.stats("t").get.manifestGen
    assert(gen.nonEmpty)
    TableCatalog.deleteRecursively(Paths.get(cat.path("t"), "_manifest", gen))
    // envelopes gone → file-set equality fails → refusal, not a silent
    // full (or empty) scan
    val e = intercept[IllegalArgumentException](
      cat.prunedRead("t", Seq(("id", 0L, 10L))))
    assert(e.getMessage.contains("stale"))
  }

  test("head cache serves the parse until the sidecar changes") {
    val cat = freshCat()
    mk(cat, "t", 4)
    val st1 = cat.stats("t").get
    // same fingerprint → the SAME parsed instance comes back (eq, not
    // just ==): the planning path pays zero parses between writes
    assert(cat.stats("t").get eq st1)
    // an indexed append rewrites the head and invalidates — new parse
    cat.appendIndexed("t", Seq((90001L, 1L)).toDF("id", "a"), Seq("id", "a"))
    val st2 = cat.stats("t").get
    assert(!(st2 eq st1) && st2.rows === st1.rows + 1)
    assert(cat.stats("t").get eq st2)
    // envelope cache: same legs → same instance; new leg → reload
    val env2 = cat.fileEnvelopes("t")
    assert(cat.fileEnvelopes("t").asInstanceOf[AnyRef] eq
      env2.asInstanceOf[AnyRef])
    cat.appendIndexed("t", Seq((90002L, 2L)).toDF("id", "a"), Seq("id", "a"))
    assert(cat.fileEnvelopes("t").size === env2.size + 1)
  }

  test("analyze retains the previous generation for in-flight readers") {
    val cat = freshCat()
    mk(cat, "t", 4)
    val gen1 = cat.stats("t").get.manifestGen
    cat.analyze("t", cols = Seq("id"), skipCols = Seq("id"))
    val gen2 = cat.stats("t").get.manifestGen
    assert(gen2 !== gen1)
    val mdir = Paths.get(cat.path("t"), "_manifest")
    assert(Files.exists(mdir.resolve(gen1)), "previous generation pruned early")
    // a third analyze prunes gen1 (current + previous retention rule)
    cat.analyze("t", cols = Seq("id"), skipCols = Seq("id"))
    assert(!Files.exists(mdir.resolve(gen1)))
    assert(Files.exists(mdir.resolve(gen2)))
    // vacuum (grace 0) sweeps everything but the live generation
    val classes = cat.vacuum("t", graceMs = 0L).map(_._1)
    assert(classes.contains("manifest_orphan"))
    assert(Files.exists(mdir.resolve(cat.stats("t").get.manifestGen)))
    assert(!Files.exists(mdir.resolve(gen2)))
  }
}
