package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** Deletion vectors must delete WITHOUT touching data files, apply
  * idempotently, accumulate across conditions, fold away via apply,
  * and compose with the partition-rewrite delete — and a versioned
  * table must be refused (its deletes are snapshot rewrites). */
class DeleteVectorSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("dv-cat").toString)

  private def mk(cat: TableCatalog, name: String): Unit =
    cat.overwrite(name, (0 until 10000)
      .map(i => (i.toLong, i.toLong % 100, s"r$i")).toDF("id", "grp", "s")
      .repartition(8))

  private def dataFiles(cat: TableCatalog, name: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(Paths.get(cat.path(name)))
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_dv") && !p.toString.contains("_tmp"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    finally s.close()
  }

  test("delete touches no data file and readMor equals the filter") {
    val cat = freshCat(); mk(cat, "t")
    val before = dataFiles(cat, "t")
    val n = cat.deleteVectorize("t", col("grp") === 7)
    assert(n === 100L)
    assert(dataFiles(cat, "t") === before, "a data file changed")
    assert(cat.readMor("t").count() === 9900L)
    assert(cat.readMor("t").filter(col("grp") === 7).count() === 0L)
    // plain read still sees everything — the vectors are metadata
    assert(cat.read("t").count() === 10000L)
  }

  test("re-deleting the same condition is idempotent (0 new rows)") {
    val cat = freshCat(); mk(cat, "t")
    assert(cat.deleteVectorize("t", col("grp") === 7) === 100L)
    assert(cat.deleteVectorize("t", col("grp") === 7) === 0L)
    assert(cat.readMor("t").count() === 9900L)
  }

  test("vectors accumulate across conditions; overlap counts once") {
    val cat = freshCat(); mk(cat, "t")
    assert(cat.deleteVectorize("t", col("grp") === 7) === 100L)
    // overlaps grp=7 on ids ≡ 7 (mod 100) below 5000 — already dead
    assert(cat.deleteVectorize("t", col("id") < 5000 && col("grp") === 7) === 0L)
    assert(cat.deleteVectorize("t", col("id") < 50) === 49L) // id 7 is dead
    assert(cat.readMor("t").count() === 10000L - 100L - 49L)
  }

  test("NULL-evaluating rows survive (right-to-be-forgotten rule)") {
    val cat = freshCat()
    cat.overwrite("t", Seq((1L, Some(1L)), (2L, None), (3L, Some(3L)))
      .toDF("id", "v"))
    assert(cat.deleteVectorize("t", col("v") > 1) === 1L)
    assert(cat.readMor("t").select("id").as[Long].collect().toSet
      === Set(1L, 2L))
  }

  test("applyDeleteVectors folds, clears vectors, plain read agrees") {
    val cat = freshCat(); mk(cat, "t")
    cat.deleteVectorize("t", col("grp") === 7)
    cat.deleteVectorize("t", col("id") < 50)
    val folded = cat.applyDeleteVectors("t")
    assert(folded === 149L)
    assert(!Files.exists(Paths.get(cat.path("t"), "_dv")))
    assert(cat.read("t").count() === 9851L)
    assert(cat.read("t").filter(col("grp") === 7).count() === 0L)
    // a second apply is a no-op
    assert(cat.applyDeleteVectors("t") === 0L)
  }

  test("deleteWhere reads through the vectors (no resurrection)") {
    val cat = freshCat()
    cat.appendPartitioned("t", (0 until 1000)
      .map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dt"), "dt")
    // autoFold disabled: the MoR-compose path is the thing under test
    assert(cat.deleteVectorize("t", col("id") < 100, autoFoldAt = 2d) === 100L)
    assert(cat.hasDeleteVectors("t"))
    // partition rewrite of d0 must not bring back its vectored rows
    val (affected, _) = cat.deleteWhere("t", "dt", col("id") >= 900)
    assert(affected.nonEmpty)
    assert(cat.readMor("t").count() === 1000L - 100L - 100L)
    assert(cat.readMor("t").filter(col("id") < 100).count() === 0L)
  }

  test("fold preserves a partitioned table's directory layout") {
    val cat = freshCat()
    cat.appendPartitioned("t", (0 until 1000)
      .map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dt"), "dt")
    cat.deleteVectorize("t", col("id") < 100, autoFoldAt = 2d)
    assert(cat.applyDeleteVectors("t") === 100L)
    // layout survived: partition dirs still present, no flat root files
    val dirs = Files.list(Paths.get(cat.path("t")))
    import scala.jdk.CollectionConverters._
    val names = try dirs.iterator().asScala.map(_.getFileName.toString).toSet
      finally dirs.close()
    assert(names.count(_.startsWith("dt=")) === 4)
    assert(!names.exists(_.endsWith(".parquet")), s"flat files leaked: $names")
    // partition-addressed verbs still work on the folded table: a
    // deleteWhere purge must actually remove its rows (the ADVICE r9
    // resurrection scenario)
    cat.deleteWhere("t", "dt", col("id") >= 900)
    assert(cat.readMor("t").count() === 1000L - 100L - 100L)
    assert(cat.read("t").filter(col("id") < 100).count() === 0L)
  }

  test("crossing the auto-fold threshold folds in the same verb") {
    val cat = freshCat(); mk(cat, "t")
    // 100 of 10000 rows: 1% < 10% — vectors persist
    assert(cat.deleteVectorize("t", col("grp") === 7) === 100L)
    assert(cat.hasDeleteVectors("t"))
    // +900 new (grp 7 already dead) → 1000 vectored of 10000 = 10% —
    // threshold reached, folded in the same call
    assert(cat.deleteVectorize("t", col("grp") < 10) === 900L)
    assert(!cat.hasDeleteVectors("t"))
    assert(cat.read("t").count() === 9000L) // plain read: fold is physical
    assert(cat.readMor("t").count() === 9000L)
  }

  test("a versioned table is refused; compaction FOLDS live vectors") {
    val cat = freshCat()
    cat.replaceAtomic("v", Seq((1L, 2L)).toDF("id", "v"))
    assertThrows[IllegalArgumentException] {
      cat.deleteVectorize("v", col("id") === 1)
    }
    mk(cat, "t")
    cat.deleteVectorize("t", col("grp") === 7)
    // VERDICT r9 next #3: compaction folds instead of refusing — the
    // committed snapshot holds only survivors and the read plan has no
    // anti-join leg left
    val nFiles = cat.compactSmallFiles("t")
    assert(nFiles >= 1)
    assert(!cat.hasDeleteVectors("t"))
    assert(cat.read("t").count() === 9900L)
    assert(cat.read("t").filter(col("grp") === 7).count() === 0L)
    // the read plan lost its anti-join leg: no vectors → readMor is a
    // bare scan, no Join operator anywhere in it
    assert(!cat.readMor("t").queryExecution.executedPlan.toString
      .toLowerCase.contains("join"))
  }

  test("a partition rewrite prunes exactly the vectors it orphans") {
    val cat = freshCat()
    cat.appendPartitioned("t", (0 until 1000)
      .map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dt"), "dt")
    // ids 0..7 span all four partitions
    assert(cat.deleteVectorize("t", col("id") < 8, autoFoldAt = 2d) === 8L)
    // rewrite ONLY d0: its vectors orphan (their files are replaced)
    // and must be pruned; d1–d3's vectors stay live and keep applying
    cat.deleteWhere("t", "dt", col("dt") === "d0" && col("id") >= 900)
    assert(cat.hasDeleteVectors("t"), "live vectors for d1-d3 must survive")
    assert(cat.readMor("t").filter(col("id") < 8).count() === 0L)
    // rewrite EVERY partition: all vectors orphan → the sidecar clears
    // entirely, so SQL reads and ANALYZE stop refusing a table with
    // zero live vectors (the r10 review finding)
    cat.deleteWhere("t", "dt", col("id") >= 800)
    assert(!cat.hasDeleteVectors("t"),
      "orphaned vectors must not pin hasDeleteVectors forever")
    cat.analyze("t") // would throw while vectors appeared live
    assert(cat.readMor("t").count() ===
      cat.read("t").count(), "no vectors: MoR and bare read agree")
  }
}
