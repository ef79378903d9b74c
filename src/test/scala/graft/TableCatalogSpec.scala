package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.TableCatalog

/** Storage-layout behaviors of the parquet catalog beyond what the
  * golden E2E exercises: bucketed co-located joins. */
class TableCatalogSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("tables bucketed on the join key join without any shuffle or sort") {
    val cat = new TableCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_cat_").toString)
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L by 2).map(i => (i, s"r$i")).toDF("k", "rv")
    cat.overwriteBucketed("bkt_left", left, "k", 4)
    cat.overwriteBucketed("bkt_right", right, "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = cat.readBucketed("bkt_left")
        .join(cat.readBucketed("bkt_right"), Seq("k"))
      assert(joined.count() === 500)
      // co-located: the sort-merge join reads the bucketed layout
      // directly — no Exchange (shuffle) on either side
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
