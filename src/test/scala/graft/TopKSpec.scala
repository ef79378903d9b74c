package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TopK

/** Bounded-buffer per-group top-k: equivalence to the window form, tie
  * determinism, and the partial-aggregation physical plan. */
class TopKSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("rank", row_number().over(
      Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
    .filter(col("rank") <= k)
    .select(col("g"), col("rank"), col("id"), col("v"))

  test("matches the window form on skewed groups, ties, and short groups") {
    val rnd = new scala.util.Random(11)
    // group 0 is hot (300 rows), groups 1-20 small (1-6 rows); values
    // drawn from a tiny domain so ties are guaranteed
    val rows = (0 until 300).map(i => (0L, i.toLong, rnd.nextInt(10).toDouble)) ++
      (1 to 20).flatMap(g => (0 until (g % 6 + 1)).map(i =>
        (g.toLong, (1000 * g + i).toLong, rnd.nextInt(10).toDouble)))
    val df = rows.toDF("g", "id", "v")
    for (k <- Seq(1, 3, 8)) {
      val exact = windowTopK(df, k).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val fast = TopK.perGroup(df, Seq("g"), "v", "id", k).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(fast === exact, s"k=$k")
    }
  }

  test("null ordering values are excluded; k beyond group size returns the whole group") {
    val df = Seq((1L, 10L, Some(5.0)), (1L, 11L, None), (2L, 20L, Some(1.0)))
      .toDF("g", "id", "v")
    val out = TopK.perGroup(df, Seq("g"), "v", "id", k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 1, 10L), (2L, 1, 20L)))
  }

  test("non-integral id column is rejected at construction, not mid-job") {
    val df = Seq(("g", "doc-1", 1.0)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq("g"), "v", "id", k = 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("physical plan aggregates partially map-side (no full-group sort)") {
    val df = Seq((1L, 1L, 1.0)).toDF("g", "id", "v")
    val plan = TopK.perGroup(df, Seq("g"), "v", "id", k = 2)
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate pair around the exchange; the
    // window form would show Sort + Window instead
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
