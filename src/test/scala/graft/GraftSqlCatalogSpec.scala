package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** The DSv2 SQL surface over the versioned catalog: snapshot + time
  * travel resolution, plain-table fallback, bare-scan DV refusal, and
  * the read-only contract. */
class GraftSqlCatalogSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private var seq = 0
  private def freshSqlCat(): (TableCatalog, String) = {
    val root = Files.createTempDirectory("sqlcat").toString
    seq += 1
    val name = s"gspec$seq"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    (new TableCatalog(spark, root), name)
  }

  test("snapshot + VERSION AS OF resolve through plain SQL") {
    val (cat, g) = freshSqlCat()
    val v1 = cat.replaceAtomic("d", Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    cat.replaceAtomic("d", Seq((1L, "a2"), (3L, "c")).toDF("k", "s"))
    assert(spark.sql(s"SELECT k, s FROM $g.d ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a2"), (3L, "c")))
    assert(spark.sql(s"SELECT k, s FROM $g.d VERSION AS OF $v1 ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // filters push into the stock parquet scan (the plugin only
    // resolves the directory; Spark plans the read)
    val plan = spark.sql(s"SELECT k FROM $g.d WHERE k = 3")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)"),
      s"filter not pushed:\n$plan")
  }

  test("plain tables read; DV-carrying tables refuse; listTables lists") {
    val (cat, g) = freshSqlCat()
    cat.append("p", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"))
    assert(spark.sql(s"SELECT sum(v) FROM $g.p").as[Long].head() === 60L)
    cat.deleteVectorize("p", col("k") === 1, autoFoldAt = 2d)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $g.p").collect())
    assert(e.getMessage.contains("deletion vectors"))
    cat.applyDeleteVectors("p")
    assert(spark.sql(s"SELECT sum(v) FROM $g.p").as[Long].head() === 50L)
    assert(spark.sql(s"SHOW TABLES IN $g").collect().map(_.getString(1)).toSet
      === Set("p"))
  }

  test("the catalog is read-only; unknown tables/versions are loud") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v"))
    val w = intercept[Exception](
      spark.sql(s"INSERT INTO $g.d VALUES (9, 9)"))
    assert(w.getMessage.toLowerCase.contains("read-only") ||
      w.getMessage.toLowerCase.contains("unsupported"))
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.nope").collect()).getMessage.nonEmpty)
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.d VERSION AS OF 99").collect())
      .getMessage.nonEmpty)
  }

  test("an uncommitted snapshot directory is never served") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, 2L)).toDF("k", "v"))
    // a crashed writer's partial `_v7` sits on disk with the pointer
    // still at 1 — `VERSION AS OF 7` must refuse (r10 review: bare
    // Files.exists served partial rows), not read the half-written dir
    Files.createDirectories(java.nio.file.Paths.get(cat.path("d"), "_v7"))
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $g.d VERSION AS OF 7").collect())
      .getMessage.nonEmpty)
    // the committed version still resolves
    assert(spark.sql(s"SELECT k FROM $g.d VERSION AS OF 1").count() === 1L)
  }

  test("TIMESTAMP AS OF travels through plain SQL") {
    val (cat, g) = freshSqlCat()
    cat.replaceAtomic("d", Seq((1L, "a")).toDF("k", "s"))
    Thread.sleep(30)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(30)
    cat.replaceAtomic("d", Seq((1L, "b")).toDF("k", "s"))
    assert(spark.sql(s"SELECT s FROM $g.d TIMESTAMP AS OF '$between'")
      .as[String].head() === "a")
    assert(spark.sql(s"SELECT s FROM $g.d").as[String].head() === "b")
    // a probe before the first commit refuses — serving the current
    // snapshot for a pre-history instant would lie about what existed
    assert(intercept[Exception](spark.sql(
      s"SELECT * FROM $g.d TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
      .getMessage.nonEmpty)
  }
}
