package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** Additive schema evolution on versioned tables: silent drift is
  * refused, an explicit mergeSchema append widens the declared schema
  * (null-filling either side), time travel reads the shape each
  * version HAD, and a full rewrite supersedes the log. Without the
  * schema log a hard-linked snapshot mixes file schemas and footer
  * sampling decides what a read returns — the failure this exists to
  * close. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("evo-cat").toString)

  test("silent drift and type conflicts are refused loudly") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L)).toDF("k", "v"))
    val drift = intercept[IllegalArgumentException](
      cat.appendAtomic("t", Seq((2L, 20L, "x")).toDF("k", "v", "w")))
    assert(drift.getMessage.contains("mergeSchema"))
    // a type conflict is never mergeable
    val conflict = intercept[IllegalArgumentException](
      cat.appendAtomic("t", Seq((3L, "oops")).toDF("k", "v"),
        mergeSchema = true))
    assert(conflict.getMessage.contains("type conflict"))
    assert(cat.read("t").count() === 1L, "failed appends commit nothing")
  }

  test("additive evolution: widened reads, null-fill, schema time travel") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((3L, 30L, "c3")).toDF("k", "v", "w"),
      mergeSchema = true)
    // current read: the union schema, old rows null-filled on w
    val cur = cat.read("t")
    assert(cur.columns.toSeq === Seq("k", "v", "w"))
    assert(cur.count() === 3L)
    assert(cur.filter(col("w").isNull).select(col("k")).as[Long]
      .collect().toSet === Set(1L, 2L))
    // an append MISSING a column also evolves: new rows null-fill v
    cat.appendAtomic("t", Seq((4L, "c4")).toDF("k", "w"), mergeSchema = true)
    val r4 = cat.read("t").filter(col("k") === 4L)
      .select(col("v"), col("w")).collect().head
    assert(r4.isNullAt(0) && r4.getString(1) == "c4")
    // time travel reads the shape each version HAD
    assert(cat.readVersion("t", 1L).columns.toSeq === Seq("k", "v"))
    assert(cat.readVersion("t", 2L).columns.toSeq === Seq("k", "v", "w"))
    // aggregation over the union schema stays exact
    assert(cat.read("t").agg(sum(col("v"))).head().getLong(0) === 60L)
  }

  test("a full rewrite supersedes the log; restore round-trips the shape") {
    val cat = freshCat()
    cat.replaceAtomic("t", Seq((1L, 10L)).toDF("k", "v"))
    cat.appendAtomic("t", Seq((2L, 20L, "x")).toDF("k", "v", "w"),
      mergeSchema = true)
    assert(cat.read("t").columns.toSeq === Seq("k", "v", "w"))
    // the rewrite re-declares a narrower schema
    cat.replaceAtomic("t", Seq((9L, "z9")).toDF("k", "z"))
    assert(cat.read("t").columns.toSeq === Seq("k", "z"))
    // history keeps the evolved shape; restore brings it back
    assert(cat.readVersion("t", 2L).columns.toSeq === Seq("k", "v", "w"))
    cat.restore("t", 2L)
    assert(cat.read("t").columns.toSeq === Seq("k", "v", "w"))
    assert(cat.read("t").count() === 2L)
  }

  test("ANALYZE and the SQL catalog read the declared schema") {
    val root = Files.createTempDirectory("evo-sql")
    val cat = new TableCatalog(spark, root.toString)
    cat.replaceAtomic("t", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    cat.appendAtomic("t", (100 until 150).map(i =>
      (i.toLong, i.toLong, s"s$i")).toDF("k", "v", "w"), mergeSchema = true)
    val st = cat.analyze("t")
    assert(st.rows === 150L)
    assert(st.ndv.contains("w"), "the evolved column must be analyzed")
    val cname = "gevo_" + root.getFileName.toString
      .replaceAll("[^A-Za-z0-9_]", "_")
    spark.conf.set(s"spark.sql.catalog.$cname",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cname.root", root.toString)
    assert(spark.sql(s"SELECT count(w) FROM $cname.t").head().getLong(0)
      === 50L)
    // VERSION AS OF 1 predates the evolution: no w column there
    assert(!spark.sql(s"SELECT * FROM $cname.t VERSION AS OF 1")
      .columns.contains("w"))
  }
}
