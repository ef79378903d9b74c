package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** Column mapping via parquet field ids: RENAME/DROP COLUMN as pure
  * metadata commits — the bytes never move, readers match columns by
  * stable id, time travel keeps each version's declared names, and a
  * dropped column's id retires so re-adding the name can never
  * resurrect old bytes. */
class ColumnMappingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("cmap-cat").toString)

  test("RENAME COLUMN is a metadata commit: same bytes, new name, pushdown intact") {
    val cat = freshCat()
    val v1 = cat.replaceAtomic("t",
      (0 until 1000).map(i => (i.toLong, i.toLong * 2)).toDF("k", "v")
        .repartition(4))
    val filesBefore = cat.read("t").inputFiles.sorted.toSeq
    val v2 = cat.renameColumn("t", "v", "amount")
    assert(v2 === v1 + 1)
    // the data files are the SAME inodes — nothing was rewritten
    assert(spark.read.parquet(cat.path("t") + s"/_v$v2").inputFiles.length
      === filesBefore.length)
    assert(cat.read("t").columns.toSeq === Seq("k", "amount"))
    assert(cat.read("t").agg(sum(col("amount"))).as[Long].head()
      === (0 until 1000).map(_.toLong * 2).sum)
    // filter pushdown on the renamed column still answers correctly
    assert(cat.read("t").filter(col("amount") === 10L)
      .select("k").as[Long].head() === 5L)
    // time travel keeps the OLD declared name
    assert(cat.readVersion("t", v1).columns.toSeq === Seq("k", "v"))
    assert(cat.readVersion("t", v1).agg(sum(col("v"))).as[Long].head()
      === (0 until 1000).map(_.toLong * 2).sum)
    // history logs the operation
    assert(cat.history("t").select("op").as[String].collect()
      .contains("RENAME_COLUMN"))
  }

  test("appends after a rename mix old- and new-named files correctly") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cat.renameColumn("t", "v", "w")
    cat.appendAtomic("t", Seq((3L, 30L)).toDF("k", "w"))
    // old files store column "v" (id 2), new files "w" (id 2): one read
    assert(cat.read("t").orderBy("k").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // a second rename over the mixed layout still works
    cat.renameColumn("t", "w", "x")
    assert(cat.read("t").select(sum("x")).as[Long].head() === 60L)
    // and evolution appends still extend (fresh id for the new column)
    cat.appendAtomic("t", Seq((4L, 40L, "d")).toDF("k", "x", "tag"),
      mergeSchema = true)
    assert(cat.read("t").filter(col("tag").isNotNull).count() === 1L)
    assert(cat.read("t").count() === 4L)
  }

  test("DROP COLUMN retires the id: a re-added name never resurrects old bytes") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 111L), (2L, 222L)).toDF("k", "secret"))
    cat.dropColumn("t", "secret")
    assert(cat.read("t").columns.toSeq === Seq("k"))
    // re-add the SAME name: old files still hold 111/222 under the dead
    // id — they must surface as NULL, not as the dropped values
    cat.appendAtomic("t", Seq((3L, 999L)).toDF("k", "secret"),
      mergeSchema = true)
    val got = cat.read("t").orderBy("k")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, None), (2L, None), (3L, Some(999L))),
      s"dropped bytes resurrected: $got")
    // the only column cannot be dropped
    cat.dropColumn("t", "secret")
    assertThrows[IllegalArgumentException](cat.dropColumn("t", "k"))
  }

  test("unprovable stamping, constraints, and MV keys refuse the alter loudly") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L)).toDF("k", "v"))
    // constraint referencing the column
    cat.addConstraint("t", "v_pos", "v >= 0")
    val e1 = intercept[IllegalArgumentException](cat.renameColumn("t", "v", "w"))
    assert(e1.getMessage.contains("v_pos"))
    cat.dropConstraint("t", "v_pos")
    // no valid marker (simulating a pre-mapping table / RLO rewrite)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(cat.path("t"), "_fieldids.json"))
    val e2 = intercept[IllegalStateException](cat.renameColumn("t", "v", "w"))
    assert(e2.getMessage.contains("field-id marker"))
    // a full rewrite re-stamps and unblocks
    cat.compactSmallFiles("t")
    cat.renameColumn("t", "v", "w")
    assert(cat.read("t").columns.toSeq === Seq("k", "w"))
    // plain tables refuse (no snapshot layout)
    cat.append("p", Seq((1L, 1L)).toDF("a", "b"))
    assertThrows[IllegalArgumentException](cat.renameColumn("p", "a", "c"))
  }

  test("SQL reads and ALTER TABLE RENAME COLUMN work through the catalog plugin") {
    val cat = freshCat()
    cat.replaceAtomic("d", Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    val g = "gcmap" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", cat.root)
    spark.sql(s"ALTER TABLE $g.d RENAME COLUMN v TO price")
    assert(spark.sql(s"SELECT sum(price) FROM $g.d").as[Long].head() === 11L)
    // pushdown through the DSv2 scan still prunes by the renamed column
    assert(spark.sql(s"SELECT k FROM $g.d WHERE price = 6").as[Long].head()
      === 2L)
    // DROP COLUMN through SQL too
    spark.sql(s"ALTER TABLE $g.d DROP COLUMN price")
    assert(spark.sql(s"SELECT * FROM $g.d").columns.toSeq === Seq("k"))
  }

  test("a SQL row-level rewrite downgrades to names; rename needs a re-stamp") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cat.renameColumn("t", "v", "w")
    val g = "gcmap" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", cat.root)
    // UPDATE rewrites every file through Spark's planner (no id stamps)
    spark.sql(s"UPDATE $g.t SET w = w + 1 WHERE k = 1")
    // reads stay correct — the rewrite declared logical names
    assert(cat.read("t").orderBy("k").as[(Long, Long)].collect().toSeq
      === Seq((1L, 11L), (2L, 20L)))
    // time travel to the pre-UPDATE version still resolves by id
    assert(cat.readVersion("t", 2L).columns.toSeq === Seq("k", "w"))
    assert(cat.readVersion("t", 2L).orderBy("k").as[(Long, Long)]
      .collect().toSeq === Seq((1L, 10L), (2L, 20L)))
    // but the marker is gone: the next rename demands a re-stamp
    val e = intercept[IllegalStateException](cat.renameColumn("t", "w", "x"))
    assert(e.getMessage.contains("field-id marker"))
    cat.optimizeZOrder("t", Seq("k"), numPartitions = 1)
    cat.renameColumn("t", "w", "x")
    assert(cat.read("t").select(sum("x")).as[Long].head() === 31L)
  }
}
