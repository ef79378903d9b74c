package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** Zero-copy CLONE: v1 of the clone hard-links the source's current
  * snapshot; the two tables diverge independently forever after. */
class CloneSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(retentionMs: Long = 15L * 60 * 1000): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("cl-cat").toString,
      snapshotRetentionMs = retentionMs)

  test("clone equals the source at the pinned snapshot, then diverges both ways") {
    val cat = freshCat()
    cat.replaceAtomic("src", (1 to 10).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    assert(cat.cloneTable("src", "dst") === 1L)
    assert(cat.read("dst").orderBy("k").collect().toSeq ===
      cat.read("src").orderBy("k").collect().toSeq)
    // diverge the SOURCE: the clone must not move
    cat.appendAtomic("src", Seq((100L, 100L)).toDF("k", "v"))
    assert(cat.read("src").count() === 11L)
    assert(cat.read("dst").count() === 10L)
    // diverge the CLONE: the source must not move
    cat.replaceAtomic("dst", cat.read("dst").filter(col("k") <= 5L))
    assert(cat.read("dst").count() === 5L)
    assert(cat.read("src").count() === 11L)
    // the clone has its own history, starting at CLONE
    assert(cat.history("dst").orderBy("version").select("op")
      .as[String].collect().toSeq === Seq("CLONE", "REPLACE"))
  }

  test("stats travel with the clone, equal a fresh ANALYZE, and the " +
      "clone's pruned reads work from birth (r11 verdict #5)") {
    val cat = freshCat()
    cat.replaceAtomic("src", (1 to 200)
      .map(i => (i.toLong, (i % 7).toLong, s"u$i")).toDF("k", "m", "s")
      .repartition(4, col("k")))
    cat.analyze("src", cols = Seq("k", "m"), skipCols = Seq("k"),
      bloomCols = Seq("s"))
    cat.cloneTable("src", "dst")
    val carried = cat.stats("dst").getOrElse(fail("stats did not travel"))
    assert(carried.version === Some(1L), "head must re-stamp the clone's v1")
    // a fresh ANALYZE over the same (linked) bytes agrees exactly
    cat.cloneTable("src", "fresh")
    val re = cat.analyze("fresh", cols = Seq("k", "m"), skipCols = Seq("k"),
      bloomCols = Seq("s"))
    assert(carried.rows === re.rows)
    assert(carried.ndv === re.ndv)
    assert(carried.fileCount === re.fileCount)
    // envelope legs re-keyed to the clone's paths: a range-pruned read
    // answers correctly (a stale src-keyed envelope would either refuse
    // or open the wrong files)
    assert(cat.fileEnvelopes("dst").nonEmpty)
    assert(cat.fileEnvelopes("dst").forall(_.file.contains("/dst/")),
      s"envelopes must point into the clone: ${cat.fileEnvelopes("dst").head.file}")
    assert(cat.prunedRead("dst", Seq(("k", 1L, 10L)))
      .filter(col("k").between(1L, 10L)).count() === 10L)
    // Bloom sidecars re-keyed: the point-probe path prunes on the clone
    assert(cat.prunedReadPoint("dst", Seq(("s", "u5"))).count() === 1L)
    // the mergeable NDV sketch sidecar travels under a consistent nonce
    assert(carried.ndvNonce.nonEmpty)
    assert(Files.exists(java.nio.file.Paths.get(cat.path("dst"),
      "_ndvsketch.json")))
    // the carried stats drive planning immediately (no re-analyze): the
    // broadcast-hint read resolves without throwing stale-stats
    assert(cat.readHinted("dst").count() === 200L)
  }

  test("a crashed clone leaves no half-built target; the retry heals") {
    val cat = freshCat()
    cat.replaceAtomic("src", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    // crashed-assembly residue: a scratch table dir aged past the grace
    val dead = java.nio.file.Paths.get(cat.root, "_tmp_clone-deadbeef")
    Files.createDirectories(dead.resolve("_v1"))
    Files.setLastModifiedTime(dead, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 2L * 3600 * 1000))
    cat.cloneTable("src", "dst") // sweeps the residue, lands atomically
    assert(!Files.exists(dead), "aged clone scratch must be swept")
    assert(cat.read("dst").count() === 5L)
    // a retry against an EXISTING dst refuses loudly (never clobbers)
    val e = intercept[Exception] { cat.cloneTable("src", "dst") }
    assert(e.getMessage.contains("already exists"))
  }

  test("constraints travel; a violating write on the clone refuses") {
    val cat = freshCat()
    cat.replaceAtomic("src", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.addConstraint("src", "k_pos", "k > 0")
    cat.cloneTable("src", "dst")
    val e = intercept[Exception] {
      cat.appendAtomic("dst", Seq((-1L, 0L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("k_pos"))
    // and the source's constraint list is untouched by clone-side DDL
    cat.dropConstraint("dst", "k_pos")
    assert(cat.constraintsOf("src").map(_._1) === Seq("k_pos"))
    assert(cat.constraintsOf("dst").isEmpty)
  }

  test("a renamed source clones with its field ids: old files read under the new name") {
    val cat = freshCat()
    cat.replaceAtomic("src", (1 to 5).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.renameColumn("src", "v", "v2")
    cat.cloneTable("src", "dst")
    assert(cat.read("dst").columns.toSeq === Seq("k", "v2"))
    assert(cat.read("dst").filter(col("v2").isNull).count() === 0L)
    // appends to the clone keep stamping (the marker traveled): a
    // further rename on the CLONE works without a rewrite
    cat.appendAtomic("dst", Seq((9L, 9L)).toDF("k", "v2"))
    cat.renameColumn("dst", "v2", "v3")
    assert(cat.read("dst").columns.toSeq === Seq("k", "v3"))
    assert(cat.read("dst").count() === 6L)
    // the source never saw any of it
    assert(cat.read("src").columns.toSeq === Seq("k", "v2"))
  }

  test("source retention sweep cannot break the clone (shared inodes outlive names)") {
    val cat = freshCat(retentionMs = 0L)
    cat.replaceAtomic("src", (1 to 8).map(i => (i.toLong, i.toLong)).toDF("k", "v"))
    cat.cloneTable("src", "dst")
    // churn the source so v1 (the cloned snapshot) is pruned from ITS dir
    cat.replaceAtomic("src", Seq((50L, 50L)).toDF("k", "v"))
    cat.replaceAtomic("src", Seq((51L, 51L)).toDF("k", "v"))
    assert(!cat.versions("src").contains(1L), "churn should prune src v1")
    assert(cat.read("dst").count() === 8L) // the clone still reads
    // clone target collision is loud
    assert(intercept[Exception](cat.cloneTable("src", "dst"))
      .getMessage.contains("already exists"))
  }
}
