package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Count-Min invariants: no underestimates, exactness below capacity,
  * bounded cell count. */
class SketchesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("never underestimates; exact when keys fit without collision") {
    val data = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val sketch = Sketches.countMinBuild(data, col("k"), depth = 4, width = 1024)
    val keys = (1 to 50).map(_.toLong).toDF("k")
    val est = Sketches.countMinEstimate(sketch, keys, col("k"), depth = 4, width = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { k =>
      assert(est(k.toLong) >= k.toLong, s"underestimated key $k")
    }
    // 50 keys in a 4x1024 sketch: collisions are possible but the
    // overwhelming majority must be exact — and the total overestimate
    // is bounded by the collision mass
    val exactCount = (1 to 50).count(k => est(k.toLong) == k.toLong)
    assert(exactCount >= 45, s"only $exactCount/50 exact in a near-empty sketch")
  }

  test("tiny width forces collisions but keeps the lower bound") {
    val data = Seq.fill(100)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(3)(3L)
    val sketch = Sketches.countMinBuild(data.toDF("k"), col("k"), depth = 2, width = 2)
    val est = Sketches.countMinEstimate(sketch, Seq(1L, 2L, 3L).toDF("k"),
      col("k"), depth = 2, width = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(1L) >= 100L && est(2L) >= 7L && est(3L) >= 3L)
    // two rows of two cells can hold at most the full mass twice
    assert(est.values.sum <= 2L * 110L)
  }

  test("sketch size is bounded by depth*width, not input size") {
    val data = (1 to 10000).map(_.toLong).toDF("k")
    val cells = Sketches.countMinBuild(data, col("k"), depth = 3, width = 64)
    assert(cells.count() <= 3L * 64L)
    // all mass is preserved: cell sums equal depth * n
    val total = cells.agg(sum(col("cnt"))).head().getLong(0)
    assert(total === 3L * 10000L)
  }

  test("build aggregates partially map-side (bounded shuffle payload)") {
    val data = (1 to 1000).map(_.toLong).toDF("k")
    val plan = Sketches.countMinBuild(data, col("k"), depth = 3, width = 64)
      .queryExecution.executedPlan.toString
    // partial + final HashAggregate pair: each map partition ships at
    // most depth*width cells, not its raw rows
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("NULL keys keep the never-underestimate guarantee") {
    // a NULL key present in the build input must estimate >= its true
    // count — pre-fix it bucketed to NULL, the estimate join never
    // matched, and est=0 underestimated
    val data = (Seq.fill(5)(Option.empty[String]) ++
      Seq.fill(3)(Some("a")) ++ Seq.fill(2)(Some("b"))).toDF("k")
    val sketch = Sketches.countMinBuild(data, col("k"), depth = 4, width = 1024)
    val keys = Seq(Option.empty[String], Some("a"), Some("b")).toDF("k")
    val est = Sketches.countMinEstimate(sketch, keys, col("k"),
      depth = 4, width = 1024)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(est(None) >= 5L, s"NULL key underestimated: ${est(None)}")
    assert(est(Some("a")) >= 3L && est(Some("b")) >= 2L)
  }

  test("absent key with empty cells estimates zero") {
    // single key occupies depth cells; with a wide sketch a distant key
    // almost surely probes empty cells -> 0 via the left-join coalesce
    val sketch = Sketches.countMinBuild(Seq(1L).toDF("k"), col("k"),
      depth = 2, width = 4096)
    val est = Sketches.countMinEstimate(sketch, Seq(999999L).toDF("k"),
      col("k"), depth = 2, width = 4096)
      .head().getLong(1)
    assert(est == 0L || est == 1L) // 1 only on a double hash collision
  }
}
