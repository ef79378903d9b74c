package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** MERGE INTO must route every row to exactly one of
  * update/delete/insert/keep, evaluate the delete predicate NULL→false,
  * enforce the ANSI source-cardinality rule, and commit as one
  * time-travelable snapshot. */
class MergeIntoSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("merge-cat").toString)

  test("update / delete / insert / keep in one pass, value-exact") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "name", "v"))
    // 1: update; 2: delete (v<0 marker); 5: insert; 3,4: keep
    val src = Seq((1L, "a2", 11L), (2L, "b", -1L), (5L, "e", 50L))
      .toDF("k", "name", "v")
    val (u, d, i, kept) = cat.mergeInto("t", src, Seq("k"),
      deleteWhenMatched = Some(col("v") < 0))
    assert((u, d, i, kept) === ((1L, 1L, 1L, 2L)))
    assert(cat.read("t").as[(Long, String, Long)].collect().toSet === Set(
      (1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L), (5L, "e", 50L)))
  }

  test("a NULL-evaluating delete predicate updates instead of deleting") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, Some(5L))).toDF("k", "v"))
    val src = Seq((1L, Option.empty[Long])).toDF("k", "v")
    val (u, d, _, _) = cat.mergeInto("t", src, Seq("k"),
      deleteWhenMatched = Some(col("v") > 0))
    assert((u, d) === ((1L, 0L)))
    assert(cat.read("t").as[(Long, Option[Long])].head() === ((1L, None)))
  }

  test("duplicate source keys are an ANSI cardinality error") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 1L)).toDF("k", "v"))
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      cat.mergeInto("t", dup, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("column mismatch is refused before any work") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 1L)).toDF("k", "v"))
    assertThrows[IllegalArgumentException] {
      cat.mergeInto("t", Seq((1L, 1L)).toDF("k", "other"), Seq("k"))
    }
  }

  test("the merge is one snapshot commit; time travel sees the before") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val v0 = cat.currentVersion("t").get
    cat.mergeInto("t", Seq((2L, 21L), (3L, 30L)).toDF("k", "v"), Seq("k"))
    assert(cat.currentVersion("t").get === v0 + 1)
    assert(cat.readVersion("t", v0).as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L)))
    assert(cat.read("t").as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 21L), (3L, 30L)))
  }

  test("a target carrying deletion vectors folds them into the merge") {
    val cat = freshCat()
    cat.overwrite("pt", Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("k", "v"))
    cat.deleteVectorize("pt", col("k") === 1, autoFoldAt = 2d)
    assert(cat.hasDeleteVectors("pt"))
    // the vectored row neither matches nor survives as "keep": the
    // merge reads through readMor and the committed snapshot folds it
    val (u, d, i, kept) =
      cat.mergeInto("pt", Seq((3L, 30L)).toDF("k", "v"), Seq("k"))
    assert((u, d, i, kept) === ((0L, 0L, 1L, 2L)))
    assert(!cat.hasDeleteVectors("pt"))
    assert(cat.read("pt").as[(Long, Long)].collect().toSet
      === Set((2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("composite keys join on the whole tuple") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, "x", 1L), (1L, "y", 2L))
      .toDF("k1", "k2", "v"))
    val (u, d, i, kept) = cat.mergeInto("t",
      Seq((1L, "x", 9L), (2L, "x", 3L)).toDF("k1", "k2", "v"),
      Seq("k1", "k2"))
    assert((u, d, i, kept) === ((1L, 0L, 1L, 1L)))
    assert(cat.read("t").as[(Long, String, Long)].collect().toSet === Set(
      (1L, "x", 9L), (1L, "y", 2L), (2L, "x", 3L)))
  }
}
