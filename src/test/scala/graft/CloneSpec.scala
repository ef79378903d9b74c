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
