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

  test("widenColumn is a metadata-only commit: int files read as long, " +
      "appends write long natively, time travel keeps each version's " +
      "type, narrowing refuses (r12 verdict #4)") {
    import org.apache.spark.sql.types._
    val cat = freshCat()
    cat.replaceAtomic("t", spark.range(4).select(
      col("id").cast("int").as("k"),
      col("id").cast("float").as("f"),
      col("id").cast("decimal(10,2)").as("d")))
    val files1 = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(cat.path("t"), "_v1")
      val st = Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally st.close()
    }
    val v2 = cat.widenColumn("t", "k", LongType)
    assert(v2 === 2L)
    cat.widenColumn("t", "f", DoubleType)
    cat.widenColumn("t", "d", DecimalType(20, 4))
    // metadata-only: v4 hard-links the SAME file names, no rewrite
    val files4 = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(cat.path("t"), "_v4")
      val st = Files.list(d)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally st.close()
    }
    assert(files4 === files1, "widening rewrote data files")
    // the declared shape widened; the old bytes up-cast on read
    val sch = cat.read("t").schema
    assert(sch("k").dataType === LongType)
    assert(sch("f").dataType === DoubleType)
    assert(sch("d").dataType === DecimalType(20, 4))
    assert(cat.read("t").agg(sum("k")).as[Long].head() === 6L)
    // appends write the wide type natively; both shapes read as one
    cat.appendAtomic("t", spark.range(100, 102).select(
      col("id").as("k"), col("id").cast("double").as("f"),
      col("id").cast("decimal(20,4)").as("d")))
    assert(cat.read("t").count() === 6L)
    assert(cat.read("t").agg(sum("k")).as[Long].head() === 207L)
    // time travel keeps the type each version DECLARED
    assert(cat.readVersion("t", 1L).schema("k").dataType === IntegerType)
    assert(cat.readVersion("t", 2L).schema("k").dataType === LongType)
    // same-type is a no-op; narrowing and cross-family refuse
    assert(cat.widenColumn("t", "k", LongType) === cat.currentVersion("t").get)
    val e1 = intercept[IllegalArgumentException](
      cat.widenColumn("t", "k", IntegerType))
    assert(e1.getMessage.contains("not a lossless widening"))
    assertThrows[IllegalArgumentException](
      cat.widenColumn("t", "f", FloatType))
    assertThrows[IllegalArgumentException](
      cat.widenColumn("t", "d", DecimalType(10, 2)))
    assertThrows[IllegalArgumentException](
      cat.widenColumn("t", "k", StringType))
    // long -> double is LOSSY (53-bit mantissa) and refuses
    assertThrows[IllegalArgumentException](
      cat.widenColumn("t", "k", DoubleType))
  }

  test("widening composes with the id-mapping verbs: widen then rename " +
      "keeps ids stable and old stamped files readable") {
    import org.apache.spark.sql.types._
    val cat = freshCat()
    cat.replaceAtomic("t", spark.range(3).select(
      col("id").cast("int").as("k"), col("id").cast("int").as("v")))
    cat.compactSmallFiles("t") // stamps field ids
    cat.widenColumn("t", "k", LongType)
    cat.renameColumn("t", "k", "key") // id-matched rename AFTER the widen
    assert(cat.read("t").schema("key").dataType === LongType)
    assert(cat.read("t").agg(sum("key")).as[Long].head() === 3L)
    // SQL surface: ALTER COLUMN TYPE routes to the widening verb
    val root = cat.root
    spark.conf.set("spark.sql.catalog.gwiden",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwiden.root", root)
    spark.sql("ALTER TABLE gwiden.t ALTER COLUMN v TYPE DOUBLE")
    assert(spark.sql("SELECT sum(v) FROM gwiden.t").head().getDouble(0) === 3.0)
    // narrowing refuses — Spark's own analyzer gate (canUpCast) fires
    // first for BIGINT->INT; our verb backs it for what slips through
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gwiden.t ALTER COLUMN key TYPE INT"))
    assert(e.getMessage.contains("not a lossless widening") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e.getMessage)
    // long -> double passes Spark's gate but is lossy: OUR verb refuses
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gwiden.t ALTER COLUMN key TYPE DOUBLE"))
    assert(e2.getMessage.contains("not a lossless widening"), e2.getMessage)
  }
}
