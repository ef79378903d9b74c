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
      def joinPlan(): String = {
        val joined = cat.readBucketed("bkt_left")
          .join(cat.readBucketed("bkt_right"), Seq("k"))
        assert(joined.count() === 500)
        joined.queryExecution.executedPlan.toString
      }
      // co-located: the sort-merge join reads the bucketed layout
      // directly — no Exchange (shuffle) on either side
      val plan = joinPlan()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // sort elimination additionally needs the scan to trust the bucket
      // sort order, which Spark ≥3 only does behind the legacy flag AND
      // with one file per bucket — which overwriteBucketed guarantees
      val prevOrdering = spark.conf
        .getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val orderedPlan = joinPlan()
        assert(!orderedPlan.contains("Sort ["),
          s"one-file-per-bucket + legacy scan ordering should not re-sort:\n$orderedPlan")
      } finally prevOrdering match {
        case Some(v) => spark.conf
          .set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None => spark.conf
          .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cat.dropBucketed("bkt_left")
      cat.dropBucketed("bkt_right")
    }
  }
}
