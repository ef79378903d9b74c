package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** NESTED schema evolution (r16 verdict next #4): ADD / RENAME /
  * DROP / widen of struct FIELDS through the same machinery the
  * top-level verbs use — metadata-only commits, nested field-id
  * column mapping (files stamped at every struct depth by any full
  * rewrite), evolved reads over pre-evolution parquet, and the loud
  * refusal when files cannot be proven nested-stamped. */
class NestedEvolutionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def freshCat(): TableCatalog =
    new TableCatalog(spark, Files.createTempDirectory("nest-cat").toString)

  private def structDf(n: Int) =
    (0 until n).map(i => (i.toLong, (s"doc$i", i * 10)))
      .toDF("k", "meta")
      .select(col("k"), col("meta._1").as("title"), col("meta._2").as("score"))
      .select(col("k"), struct(col("title"), col("score")).as("meta"))

  test("a full rewrite stamps field ids at EVERY struct depth and the " +
      "marker records it; nested RENAME then serves old bytes by id") {
    val cat = freshCat()
    val v1 = cat.replaceAtomic("t", structDf(100).repartition(3))
    assert(cat.idMarker("t").exists(_.nested),
      "replaceAtomic must mint a NESTED-capable marker")
    assert(cat.idMarker("t").exists(m =>
      m.ids.contains("meta.title") && m.ids.contains("meta.score")),
      s"nested paths must carry ids: ${cat.idMarker("t")}")
    val filesBefore = cat.read("t").inputFiles.length
    // the rename: metadata-only, same files
    val v2 = cat.renameColumnPath("t", Seq("meta", "title"), "headline")
    assert(v2 === v1 + 1)
    assert(spark.read.parquet(cat.path("t") + s"/_v$v2").inputFiles.length
      === filesBefore, "nested rename must rewrite nothing")
    val r = cat.read("t")
    assert(r.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("headline", "score"))
    // THE critical assertion: pre-rename bytes serve under the new
    // nested name (id-matched, never null-filled)
    assert(r.select(col("meta.headline")).as[String].collect()
      .count(_ != null) === 100,
      "old rows must serve the renamed nested field BY ID")
    assert(r.filter(col("meta.headline") === "doc7").select("k")
      .as[Long].head() === 7L)
    // time travel keeps the pre-rename nested name
    assert(cat.readVersion("t", v1).schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("title", "score"))
    assert(cat.readVersion("t", v1).select(col("meta.title"))
      .as[String].collect().count(_ != null) === 100)
    // appends after the rename stamp the new path's id and mix
    cat.appendAtomic("t", (1000 until 1010)
      .map(i => (i.toLong, (s"doc$i", i * 10))).toDF("k", "m")
      .select(col("k"), struct(col("m._1").as("headline"),
        col("m._2").as("score")).as("meta")))
    assert(cat.read("t").select(col("meta.headline")).as[String]
      .collect().count(_ != null) === 110)
  }

  test("nested ADD is metadata-only: old files null-fill the new " +
      "field, new appends carry it; re-ADD of a DROPPED nested name " +
      "draws a fresh id and never resurrects old bytes") {
    val cat = freshCat()
    cat.replaceAtomic("t", structDf(50).repartition(2))
    val v2 = cat.addNestedColumn("t", Seq("meta"),
      StructField("lang", StringType, nullable = true))
    val st = cat.read("t").schema("meta").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq === Seq("title", "score", "lang"))
    assert(cat.read("t").select(col("meta.lang")).as[String].collect()
      .forall(_ == null), "old rows null-fill the added nested field")
    // new rows carry it
    val add = (100 until 105).map(i =>
      (i.toLong, (s"doc$i", i, "en"))).toDF("k", "m")
      .select(col("k"), col("m._1").as("title"), col("m._2").as("score"),
        col("m._3").as("lang"))
      .select(col("k"),
        struct(col("title"), col("score"), col("lang")).as("meta"))
    cat.appendAtomic("t", add)
    assert(cat.read("t").filter(col("meta.lang") === "en").count() === 5L)
    assert(cat.read("t").count() === 55L)
    // DROP score, then re-ADD the same nested name: fresh id — the 50
    // old files still hold 'score' bytes under the RETIRED id, and
    // they must never resurrect
    cat.dropColumnPath("t", Seq("meta", "score"))
    assert(cat.read("t").schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("title", "lang"))
    cat.addNestedColumn("t", Seq("meta"),
      StructField("score", IntegerType, nullable = true))
    assert(cat.read("t").select(col("meta.score")).as[java.lang.Integer]
      .collect().forall(_ == null),
      "re-added nested name must NOT resurrect dropped bytes")
    // time travel still reaches v2's shape with live score values
    assert(cat.readVersion("t", v2).select(col("meta.score"))
      .as[java.lang.Integer].collect().count(_ != null) === 50)
  }

  test("nested widen (int -> long) is metadata-only and name-based; " +
      "old leaf bytes up-cast on read") {
    val cat = freshCat()
    cat.replaceAtomic("t", structDf(40).repartition(2))
    val files = cat.read("t").inputFiles.length
    cat.widenColumnPath("t", Seq("meta", "score"), LongType)
    assert(cat.read("t").inputFiles.length === files)
    assert(cat.read("t").schema("meta").dataType.asInstanceOf[StructType]
      .apply("score").dataType === LongType)
    assert(cat.read("t").agg(sum(col("meta.score"))).as[Long].head()
      === (0 until 40).map(_ * 10L).sum)
    // narrowing refuses
    val e = intercept[IllegalArgumentException](
      cat.widenColumnPath("t", Seq("meta", "score"), IntegerType))
    assert(e.getMessage.contains("widening"), e.getMessage)
  }

  test("a PRE-NESTED marker refuses nested RENAME/DROP loudly (its " +
      "files carry top-level ids only); one full rewrite heals") {
    val cat = freshCat()
    cat.replaceAtomic("t", structDf(30).repartition(2))
    // simulate the pre-r16 marker: strip the nested flag and paths
    val mf = java.nio.file.Paths.get(cat.path("t"), "_fieldids.json")
    val m = cat.idMarker("t").get
    val legacyIds = m.ids.filterNot(_._1.contains(".")).toSeq.sortBy(_._1)
      .map { case (n, i) => s""""$n":$i""" }.mkString(",")
    java.nio.file.Files.write(mf,
      s"""{"since":${m.since},"next":${m.nextId},"ids":{$legacyIds}}"""
        .getBytes("UTF-8"))
    val e = intercept[Exception](
      cat.renameColumnPath("t", Seq("meta", "title"), "headline"))
    assert(e.getMessage.contains("predates nested"), e.getMessage)
    val e2 = intercept[Exception](
      cat.dropColumnPath("t", Seq("meta", "score")))
    assert(e2.getMessage.contains("predates nested"), e2.getMessage)
    // the heal: one full rewrite re-mints nested ids
    cat.compactSmallFiles("t")
    assert(cat.idMarker("t").exists(_.nested),
      "a full rewrite must re-mint the nested-capable marker")
    cat.renameColumnPath("t", Seq("meta", "title"), "headline")
    assert(cat.read("t").select(col("meta.headline")).as[String]
      .collect().count(_ != null) === 30)
  }

  test("restamp = true runs the stamping rewrite IN-VERB on a " +
      "pre-nested marker — rename + drop work in one call each, old " +
      "rows serve by id, and an already-stamped table pays no " +
      "rewrite (r17)") {
    val cat = freshCat()
    cat.replaceAtomic("t", structDf(30).repartition(2))
    // simulate the pre-r16 marker (top-level ids only)
    val mf = java.nio.file.Paths.get(cat.path("t"), "_fieldids.json")
    val m = cat.idMarker("t").get
    val legacyIds = m.ids.filterNot(_._1.contains(".")).toSeq.sortBy(_._1)
      .map { case (n, i) => s""""$n":$i""" }.mkString(",")
    java.nio.file.Files.write(mf,
      s"""{"since":${m.since},"next":${m.nextId},"ids":{$legacyIds}}"""
        .getBytes("UTF-8"))
    intercept[Exception](
      cat.renameColumnPath("t", Seq("meta", "title"), "headline"))
    // opt-in: stamping rewrite + rename as one verb call
    cat.renameColumnPath("t", Seq("meta", "title"), "headline",
      restamp = true)
    assert(cat.idMarker("t").exists(_.nested),
      "the in-verb rewrite must re-mint the nested-capable marker")
    assert(cat.read("t").select(col("meta.headline")).as[String]
      .collect().count(_ != null) === 30,
      "old rows must serve the renamed nested field by id")
    // a second restamp call on the NOW-stamped table is metadata-only
    // (the snapshot advances, but every data file hard-links through —
    // same names, no rewrite)
    val files = cat.read("t").inputFiles.map(_.split("/").last).toSet
    cat.dropColumnPath("t", Seq("meta", "score"), restamp = true)
    assert(cat.read("t").inputFiles.map(_.split("/").last).toSet === files,
      "restamp on an already-nested-stamped table must not rewrite")
    assert(cat.read("t").schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("headline"))
    // and a MISSING marker (crashed rewrite / SQL row-level statement)
    // heals the same way
    java.nio.file.Files.delete(mf)
    cat.renameColumnPath("t", Seq("meta", "headline"), "title",
      restamp = true)
    assert(cat.read("t").select(col("meta.title")).as[String]
      .collect().count(_ != null) === 30)
    // the TARGET validates BEFORE the stamping rewrite: a typo'd path
    // fails FREE — no data pass, no spurious commit (r17 review)
    val vBefore = cat.currentVersion("t")
    intercept[Exception](
      cat.renameColumnPath("t", Seq("meta", "no_such"), "x",
        restamp = true))
    intercept[Exception](
      cat.dropColumnPath("t", Seq("meta", "no_such"), restamp = true))
    assert(cat.currentVersion("t") === vBefore,
      "a mistyped restamp call must commit nothing")
  }

  test("restamp racing an OPEN branch (r18 adversarial probe): the " +
      "branch staged under the pre-restamp mapping REFUSES publish " +
      "loudly after the rename — never silent nulls — drop + re-stage " +
      "converges, and a crash between the stamping rewrite and the " +
      "rename half re-runs metadata-only") {
    val cat = freshCat()
    cat.replaceAtomic("t", structDf(30).repartition(2))
    // regress the marker to the pre-nested (top-level ids) state
    val mf = java.nio.file.Paths.get(cat.path("t"), "_fieldids.json")
    val m0 = cat.idMarker("t").get
    val legacyIds = m0.ids.filterNot(_._1.contains(".")).toSeq.sortBy(_._1)
      .map { case (n, i) => s""""$n":$i""" }.mkString(",")
    java.nio.file.Files.write(mf,
      s"""{"since":${m0.since},"next":${m0.nextId},"ids":{$legacyIds}}"""
        .getBytes("UTF-8"))
    // the branch stages under the LEGACY mapping; the restamp + rename
    // then change the table's id assignment underneath it
    cat.appendToBranch("t", "b", structDf(40).filter(col("k") >= 30L))
    // CRASH INTERLEAVE: the stamping half (exactly what restamp runs)
    // lands, the rename half doesn't — re-running the verb must
    // converge without a second data pass
    cat.compactSmallFiles("t")
    val files = cat.read("t").inputFiles.map(_.split("/").last).toSet
    cat.renameColumnPath("t", Seq("meta", "title"), "headline",
      restamp = true) // the re-run: marker already nested → no rewrite
    assert(cat.read("t").inputFiles.map(_.split("/").last).toSet === files,
      "the re-run after the crash must be metadata-only")
    assert(cat.read("t").select(col("meta.headline")).as[String]
      .collect().count(_ != null) === 30)
    // the open branch's stamps are now STALE — publish must refuse
    // loudly (silently linking its files would serve NULL for the
    // renamed nested field on every branch row)
    val e = intercept[IllegalArgumentException](cat.publishBranch("t", "b"))
    assert(e.getMessage.contains("stamps are stale"), e.getMessage)
    assert(cat.read("t").count() === 30L,
      "the refused publish must land nothing")
    // the message's remedy converges: drop, re-stage under the CURRENT
    // mapping, publish — exactly-once, values intact
    cat.dropBranch("t", "b")
    cat.appendToBranch("t", "b", structDf(40).filter(col("k") >= 30L)
      .select(col("k"), struct(col("meta.title").as("headline"),
        col("meta.score").as("score")).as("meta")))
    cat.publishBranch("t", "b")
    assert(cat.read("t").count() === 40L)
    assert(cat.read("t").select(col("meta.headline")).as[String]
      .collect().count(_ != null) === 40,
      "re-staged branch rows serve the renamed field after publish")
  }

  test("SQL ALTER TABLE speaks the nested verbs end to end") {
    val root = Files.createTempDirectory("nest-sql").toString
    val g = "gnest1"
    spark.conf.set(s"spark.sql.catalog.$g",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    val cat = new TableCatalog(spark, root)
    cat.replaceAtomic("t", structDf(20).repartition(2))
    spark.sql(s"ALTER TABLE $g.t ADD COLUMN meta.lang STRING")
    assert(spark.sql(s"SELECT meta.lang FROM $g.t").collect()
      .forall(_.isNullAt(0)))
    spark.sql(s"ALTER TABLE $g.t RENAME COLUMN meta.title TO headline")
    assert(spark.sql(s"SELECT meta.headline FROM $g.t WHERE k = 3")
      .head().getString(0) === "doc3")
    spark.sql(s"ALTER TABLE $g.t ALTER COLUMN meta.score TYPE BIGINT")
    assert(spark.sql(s"SELECT sum(meta.score) AS s FROM $g.t")
      .head().getLong(0) === (0 until 20).map(_ * 10L).sum)
    spark.sql(s"ALTER TABLE $g.t DROP COLUMN meta.lang")
    assert(spark.sql(s"SELECT meta.* FROM $g.t LIMIT 1").columns.toSeq
      === Seq("headline", "score"))
  }

  test("nested ADD on a PARTITIONED table evolves the spec sidecar; " +
      "old leaf files null-fill") {
    val cat = freshCat()
    val df = (0 until 20).map(i =>
      (i.toLong, (s"d$i", i), s"p${i % 2}")).toDF("k", "m", "pt")
      .select(col("k"),
        struct(col("m._1").as("title"), col("m._2").as("score")).as("meta"),
        col("pt"))
    cat.createPartitioned("t", df.schema, Seq("pt"))
    cat.insertPartitioned("t", df)
    cat.addNestedColumnPartitioned("t", Seq("meta"),
      StructField("lang", StringType, nullable = true))
    val r = cat.readPartitioned("t")
    assert(r.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("title", "score", "lang"))
    assert(r.select(col("meta.lang")).as[String].collect()
      .forall(_ == null))
    assert(r.agg(sum(col("meta.score"))).as[Long].head()
      === (0 until 20).map(_.toLong).sum)
  }
}
