package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.Files

/** The MV rewrite must be invisible (same values, names, types as the
  * fact-scan plan), must actually retarget the scan to the view, and
  * must stop matching the instant the fact moves to a new snapshot —
  * freshness is the path identity, not a timestamp. */
class MvRewriteSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def buildCat(): TableCatalog = {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-cat").toString)
    val fact = (0 until 20000)
      .map(i => (i.toLong % 37, i.toLong % 5, i.toLong)).toDF("k1", "k2", "v")
    cat.replaceAtomic("fact", fact)
    cat.createAggView("fact_by_k", "fact", Seq("k1", "k2"), "v")
    cat
  }

  private def scans(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.head.toUri.getPath
    }

  test("a matching aggregate scans the view, not the fact, same values") {
    val cat = buildCat()
    val q = cat.read("fact").groupBy("k1")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
    val paths = scans(q)
    assert(paths.size === 1 && paths.head.contains("fact_by_k"),
      s"expected a view scan, got $paths")
    // ground truth computed with the rewrite OFF
    val reg = spark.conf.get(graft.plans.MvRewrite.ConfKey)
    spark.conf.unset(graft.plans.MvRewrite.ConfKey)
    val direct = try cat.read("fact").groupBy("k1")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
      .collect().map(_.toSeq).toSet
    finally spark.conf.set(graft.plans.MvRewrite.ConfKey, reg)
    assert(q.collect().map(_.toSeq).toSet === direct)
    assert(q.schema === cat.read("fact").groupBy("k1")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi")).schema)
  }

  test("the global (ungrouped) aggregate rewrites too") {
    val cat = buildCat()
    val q = cat.read("fact").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(scans(q).head.contains("fact_by_k"))
    assert(q.as[(Long, Long)].head() === ((20000L, (0L until 20000L).sum)))
  }

  test("grouping by a key subset re-aggregates partials correctly") {
    val cat = buildCat()
    val q = cat.read("fact").groupBy("k2").agg(sum("v").as("s"))
    assert(scans(q).head.contains("fact_by_k"))
    val expect = (0 until 20000).map(i => (i.toLong % 5, i.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(q.as[(Long, Long)].collect().toMap === expect)
  }

  test("shapes the partials cannot answer exactly do not rewrite") {
    val cat = buildCat()
    // count of a COLUMN (null-sensitive), distinct, avg, non-key group,
    // aggregate over a non-value column, filtered fact
    val fact = cat.read("fact")
    val noRewrite = Seq(
      fact.groupBy("k1").agg(count(col("v")).as("x")),
      fact.groupBy("k1").agg(countDistinct(col("v")).as("x")),
      fact.groupBy("k1").agg(avg(col("v")).as("x")),
      fact.groupBy("v").agg(count(lit(1)).as("x")),
      fact.groupBy("k1").agg(sum(col("k2")).as("x")),
      fact.filter(col("k2") === 1).groupBy("k1").agg(sum("v").as("x")))
    noRewrite.foreach { q =>
      assert(scans(q).forall(!_.contains("fact_by_k")),
        s"unexpected rewrite in:\n${q.queryExecution.optimizedPlan}")
    }
    // and the unrewritten filtered query is still right
    assert(fact.filter(col("k2") === 1).agg(count(lit(1))).head().getLong(0)
      === 4000L)
  }

  test("overwriting the fact un-matches the stale view structurally") {
    val cat = buildCat()
    cat.replaceAtomic("fact",
      (0 until 100).map(i => (i.toLong, 0L, 1L)).toDF("k1", "k2", "v"))
    val q = cat.read("fact").groupBy("k2").agg(sum("v").as("s"))
    assert(scans(q).forall(!_.contains("fact_by_k")),
      "stale view answered a post-overwrite query")
    assert(q.as[(Long, Long)].head() === ((0L, 100L)))
    // refresh re-registers against the new snapshot
    cat.createAggView("fact_by_k", "fact", Seq("k1", "k2"), "v")
    val q2 = cat.read("fact").groupBy("k2").agg(sum("v").as("s"))
    assert(scans(q2).head.contains("fact_by_k"))
    assert(q2.as[(Long, Long)].head() === ((0L, 100L)))
  }

  test("a plain (unversioned) fact is refused") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-plain").toString)
    cat.overwrite("plainf", Seq((1L, 2L)).toDF("k", "v"))
    assertThrows[IllegalArgumentException] {
      cat.createAggView("pv", "plainf", Seq("k"), "v")
    }
  }
}
