package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.catalog.TableCatalog
import graft.streaming.StreamingIngest
import java.nio.file.Files

/** The streaming MV loop must keep the view exactly equal to the
  * accumulated fact after every trigger, answer aggregations from the
  * view between triggers, and converge (not double-count) across a
  * checkpoint reset — the failure mode the absorb-only sketch
  * maintenance refuses instead. */
class StreamingMvSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.head.toUri.getPath
    }

  test("per-trigger view equality, view-answered reads, reset convergence") {
    val root = Files.createTempDirectory("smv")
    val cat = new TableCatalog(spark, root.resolve("wh").toString)
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingIngest.startAggViewMaintenance(
      cat, "f", "v", Seq("k"), "x",
      mem.toDF().toDF("k", "x"), root.resolve("ckpt").toString)
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try (1 to 3).foreach { b =>
      val batch = (0 until 100).map(i => ((i % 7).toLong, (b * 1000 + i).toLong))
      fed ++= batch
      mem.addData(batch: _*)
      q.processAllAvailable()
      // after EVERY trigger the view answers, and answers exactly
      val agg = cat.read("f").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("x").as("s"),
          min("x").as("lo"), max("x").as("hi"))
      // "/v/" — the view's own path segment; a bare contains("v") would
      // match the "smv" temp-dir prefix in every scan path
      assert(scans(agg).head.contains("/v/"), s"batch $b not folded")
      val expect = fed.groupBy(_._1).map { case (k, xs) =>
        (k, xs.size.toLong, xs.map(_._2).sum, xs.map(_._2).min, xs.map(_._2).max) }
      assert(agg.as[(Long, Long, Long, Long, Long)].collect().toSet
        === expect.toSet)
    } finally q.stop()

    // checkpoint reset = foreign incarnation: partitions wiped, view
    // recomputed from the re-fed stream — converges, never doubles
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = StreamingIngest.startAggViewMaintenance(
      cat, "f", "v", Seq("k"), "x",
      mem2.toDF().toDF("k", "x"), root.resolve("ckpt2").toString)
    try {
      mem2.addData((0 until 50).map(i => ((i % 7).toLong, i.toLong)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val agg2 = cat.read("f").agg(count(lit(1)).as("n"), sum("x").as("s"))
    assert(scans(agg2).head.contains("/v/"))
    assert(agg2.as[(Long, Long)].head() ===
      ((50L, (0L until 50L).sum)))
  }
}
