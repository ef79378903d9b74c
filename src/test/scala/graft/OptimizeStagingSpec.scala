package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** The OPTIMIZE staging protocol: the expensive rewrite runs with NO
  * lock held, so a concurrent write completes during it and the
  * optimize retries against the fresh state — writers wait only for
  * the O(files) pointer swap, never for the rewrite (VERDICT r10 next
  * #2). Proven single-threaded and deterministically: the build
  * callback IS the rewrite window, so a commit issued from inside it
  * is exactly "a write landing mid-rewrite" — under the pre-r11
  * locked design that commit could not complete (the rewrite held the
  * table lease). */
class OptimizeStagingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("opt-cat").toString)

  test("a write landing mid-rewrite commits immediately; the optimize retries") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    val builds = new AtomicInteger(0)
    stagedRewriteOf(cat)("t", "OPTIMIZE_COMPACT") { mor =>
      if (builds.incrementAndGet() == 1) {
        // the racing writer: runs while the rewrite is in flight —
        // no lock is held, so this returns as fast as any append
        val t0 = System.nanoTime()
        cat.appendAtomic("t", Seq((1000L, 1000L)).toDF("k", "v"))
        assert((System.nanoTime() - t0) < 30e9,
          "the append stalled — the rewrite is holding the writer lock")
      }
      mor.coalesce(1)
    }
    // the first attempt lost the race (stale pin) and was discarded;
    // the retry saw the appended row — nothing was lost or overwritten
    assert(builds.get() === 2, s"expected one retry, got ${builds.get()} builds")
    assert(cat.read("t").count() === 101L)
    assert(cat.read("t").filter(col("k") === 1000L).count() === 1L)
    // both commits are history: the append's version and the optimize's
    val ops = cat.history("t").select("op").as[String].collect().toSeq
    assert(ops.count(_ == "OPTIMIZE_COMPACT") === 1)
    // no staging residue survives the lost attempt
    val leftovers = Files.list(java.nio.file.Paths.get(cat.path("t")))
    try {
      import scala.jdk.CollectionConverters._
      assert(!leftovers.iterator().asScala
        .exists(_.getFileName.toString.startsWith("_tmp_opt-")))
    } finally leftovers.close()
  }

  test("a deletion vector landing mid-rewrite is folded by the retry, never resurrected") {
    val cat = freshCat()
    cat.append("p", (0 until 50).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    val builds = new AtomicInteger(0)
    stagedRewriteOf(cat)("p", "OPTIMIZE_COMPACT") { mor =>
      if (builds.incrementAndGet() == 1)
        cat.deleteVectorize("p", col("k") < 10L, autoFoldAt = 2d)
      mor.coalesce(1)
    }
    assert(builds.get() === 2)
    // the fold saw the mid-rewrite vector: rows 0..9 stay deleted
    assert(cat.read("p").count() === 40L)
    assert(cat.read("p").agg(min(col("k"))).as[Long].head() === 10L)
  }

  test("a persistently-contended optimize degrades to the locked rewrite and terminates") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 20).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    val builds = new AtomicInteger(0)
    stagedRewriteOf(cat)("t", "OPTIMIZE_COMPACT") { mor =>
      // lose every optimistic attempt; the locked fallback (attempt
      // MaxOptimisticAttempts+1) must not re-enter here
      if (builds.incrementAndGet() <= TableCatalog.MaxOptimisticAttempts)
        cat.appendAtomic("t",
          Seq((builds.get() + 10000L, 0L)).toDF("k", "v"))
      mor.coalesce(1)
    }
    assert(builds.get() === TableCatalog.MaxOptimisticAttempts + 1)
    assert(cat.read("t").count() ===
      20L + TableCatalog.MaxOptimisticAttempts)
    assert(cat.history("t").select("op").as[String].collect().count(_ == "OPTIMIZE_COMPACT") === 1)
  }

  test("uncontended optimize verbs still produce their layouts end to end") {
    val cat = freshCat()
    cat.replaceAtomic("t", (0 until 10000)
      .map(i => (i.toLong, (i * 37 % 10000).toLong)).toDF("x", "y")
      .repartition(16))
    val st = cat.optimizeZOrder("t", Seq("x", "y"), numPartitions = 8)
    assert(st.skipCols === Seq("x", "y"))
    assert(cat.read("t").count() === 10000L)
    // the clustered layout prunes a box probe
    val kept = cat.prunedRead("t", Seq(("x", 0L, 99L))).inputFiles.length
    assert(kept < 8, s"z-order box probe kept $kept of 8 files")
    val n = cat.compactSmallFiles("t")
    assert(n === 1)
    assert(cat.read("t").count() === 10000L)
  }

  // stagedRewrite is package-private to graft; alias to keep tests readable
  private def stagedRewriteOf(cat: TableCatalog)(
      table: String, op: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Unit =
    cat.stagedRewrite(table, op)(build)
}
