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

  test("avg and count(v) rewrite through cnt_c, NULL-correct") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-avg").toString)
    // a NULLABLE value column: avg divides by the non-null count, so a
    // rewrite dividing by n (the row count) would shift every group
    // containing a NULL — the case cnt_c exists for
    val fact = (0 until 9000)
      .map(i => (i.toLong % 7, if (i % 3 == 0) None else Some(i.toLong)))
      .toDF("k1", "v").withColumn("k2", lit(0L))
      .select("k1", "k2", "v")
    cat.replaceAtomic("factn", fact)
    cat.createAggView("factn_by_k", "factn", Seq("k1", "k2"), "v")
    val q = cat.read("factn").groupBy("k1")
      .agg(avg("v").as("a"), count(col("v")).as("c"),
        count(lit(1)).as("n"))
    assert(scans(q).head.contains("factn_by_k"), s"got ${scans(q)}")
    val reg = spark.conf.get(graft.plans.MvRewrite.ConfKey)
    spark.conf.unset(graft.plans.MvRewrite.ConfKey)
    val direct = try cat.read("factn").groupBy("k1")
      .agg(avg("v").as("a"), count(col("v")).as("c"),
        count(lit(1)).as("n")).collect().map(_.toSeq).toSet
    finally spark.conf.set(graft.plans.MvRewrite.ConfKey, reg)
    assert(q.collect().map(_.toSeq).toSet === direct)
    // distinct stays un-rewritten (falls back to the fact scan)
    val d = cat.read("factn").groupBy("k1")
      .agg(countDistinct(col("v")).as("nd"))
    assert(scans(d).head.contains("factn") && !scans(d).head.contains("by_k"))
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
    // distinct, non-key group, aggregate over a non-value column,
    // filtered fact (count(v)/avg DO rewrite since cnt_c — see the
    // dedicated positive test)
    val fact = cat.read("fact")
    val noRewrite = Seq(
      fact.groupBy("k1").agg(countDistinct(col("v")).as("x")),
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

  test("a plain fact matches by file-set identity; appends un-match it") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-plain").toString)
    cat.overwrite("pf", (0 until 1000).map(i => (i.toLong % 10, i.toLong))
      .toDF("k", "v"))
    cat.createAggView("pf_v", "pf", Seq("k"), "v")
    def q = cat.read("pf").groupBy("k").agg(sum("v").as("s"))
    assert(scans(q).head.contains("pf_v"))
    // an append changes the fact's file set → the view must go silent
    cat.append("pf", Seq((3L, 100000L)).toDF("k", "v"))
    assert(scans(q).forall(!_.contains("pf_v")),
      "stale plain-fact view answered after an append")
    assert(q.filter(col("k") === 3).as[(Long, Long)].head()._2
      === (3L until 1000L by 10L).sum + 100000L)
  }

  test("incremental refresh folds ONLY the new files, O(new data)") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-incr").toString)
    cat.overwrite("pf", (0 until 1000).map(i => (i.toLong % 10, i.toLong))
      .toDF("k", "v").repartition(4))
    cat.createAggView("pf_v", "pf", Seq("k"), "v")
    assert(cat.refreshAggViewIncremental("pf_v", "pf") === 0) // fresh
    cat.append("pf", (1000 until 1200).map(i => (i.toLong % 10, i.toLong))
      .toDF("k", "v").repartition(2))
    val folded = cat.refreshAggViewIncremental("pf_v", "pf")
    assert(folded === 2, s"expected the 2 appended files, got $folded")
    def q = cat.read("pf").groupBy("k").agg(
      count(lit(1)).as("n"), sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
    assert(scans(q).head.contains("pf_v"))
    val expect = (0 until 1200).map(i => (i.toLong % 10, i.toLong))
      .groupBy(_._1).map { case (k, xs) =>
        (k, xs.size.toLong, xs.map(_._2).sum, xs.map(_._2).min, xs.map(_._2).max) }
      .toSet
    assert(q.as[(Long, Long, Long, Long, Long)].collect().toSet === expect)
  }

  test("a pre-cnt_c legacy view keeps refreshing in its own shape") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-legacy").toString)
    cat.overwrite("pf", (0 until 500).map(i => (i.toLong % 10, i.toLong))
      .toDF("k", "v").repartition(2))
    cat.createAggView("pf_v", "pf", Seq("k"), "v")
    // strip cnt_c: the on-disk shape of a view materialized before the
    // column existed (the registry entry is untouched)
    cat.replaceAtomic("pf_v", cat.read("pf_v").drop("cnt_c")
      .localCheckpoint(true))
    cat.append("pf", (500 until 600).map(i => (i.toLong % 10, i.toLong))
      .toDF("k", "v").repartition(1))
    // the strict-union failure mode: this threw AnalysisException and
    // nothing routed legacy views to the recompute fallback
    assert(cat.refreshAggViewIncremental("pf_v", "pf") === 1)
    assert(!cat.read("pf_v").columns.contains("cnt_c")) // stays legacy
    val got = cat.read("pf_v").orderBy("k")
      .select("k", "n", "sum_c").as[(Long, Long, Long)].collect().toSet
    val expect = (0 until 600).map(i => (i.toLong % 10, i.toLong))
      .groupBy(_._1).map { case (k, xs) =>
        (k, xs.size.toLong, xs.map(_._2).sum) }.toSet
    assert(got === expect)
  }

  test("a shrunken fact file set forces the full-recompute fallback") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-shrink").toString)
    cat.overwrite("pf", (0 until 100).map(i => (i.toLong % 5, i.toLong))
      .toDF("k", "v").repartition(4))
    cat.createAggView("pf_v", "pf", Seq("k"), "v")
    cat.overwrite("pf", (0 until 50).map(i => (i.toLong % 5, i.toLong))
      .toDF("k", "v")) // fewer files, different content
    assert(cat.refreshAggViewIncremental("pf_v", "pf") === -1)
    def q = cat.read("pf").agg(sum("v").as("s"))
    assert(scans(q).head.contains("pf_v"))
    assert(q.as[Long].head() === (0L until 50L).sum)
  }

  test("versioned fact: appendAtomic delta folds O(delta), rewrite recomputes") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-cdc").toString)
    cat.replaceAtomic("vf", (0 until 1000)
      .map(i => (i.toLong % 10, i.toLong)).toDF("k", "v"))
    cat.createAggView("vf_v", "vf", Seq("k"), "v")
    assert(cat.refreshAggViewIncremental("vf_v", "vf") === 0) // fresh
    cat.appendAtomic("vf", (1000 until 1100)
      .map(i => (i.toLong % 10, i.toLong)).toDF("k", "v").repartition(2))
    // exactly the TWO appended files fold — the four carried-over
    // (hard-linked) files contribute nothing and are never re-read
    assert(cat.refreshAggViewIncremental("vf_v", "vf") === 2)
    def recompute() = graft.ops.IncrementalAgg
      .partials(cat.read("vf"), Seq("k"), col("v")).collect().toSet
    assert(cat.read("vf_v").collect().toSet === recompute())
    // the refreshed registry pin retargets the rewrite rule at the NEW
    // snapshot: a matching aggregate scans the view again
    val q = cat.read("vf").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(scans(q).size === 1 && scans(q).head.contains("vf_v"),
      s"post-refresh aggregate not rewritten (${scans(q)})")
    assert(cat.refreshAggViewIncremental("vf_v", "vf") === 0) // fresh again
    // a rewrite removes files → min/max not invertible → full recompute
    cat.replaceAtomic("vf", cat.read("vf").filter(col("v") =!= 5L))
    assert(cat.refreshAggViewIncremental("vf_v", "vf") === -1)
    assert(cat.read("vf_v").collect().toSet === recompute())
  }

  test("a fact carrying deletion vectors is refused") {
    val cat = new TableCatalog(spark,
      Files.createTempDirectory("mv-dv").toString)
    cat.overwrite("pf", (0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("k", "v"))
    // autoFold disabled: live vectors are the refusal under test (10 of
    // 100 rows would otherwise fold at the default 10% threshold)
    cat.deleteVectorize("pf", col("k") < 10, autoFoldAt = 2d)
    assertThrows[IllegalArgumentException] {
      cat.createAggView("pf_v", "pf", Seq("k"), "v")
    }
  }
}
