package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Resample

/** Linear gap-fill semantics: exact midpoints, on-observation identity,
  * leading-gap NULL, trailing hold. */
class InterpolateSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("interpolates linearly between observations; edges behave as documented") {
    // observations at t=0 (v=100) and t=200 (v=300), step 100:
    // grid 0 → on-observation 100; grid 100 → midpoint 200; grid 200 → 300
    val series = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 100L),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:03:20"), 300L))
      .toDF("k", "ts", "vc")
    val got = Resample.interpolateLinear(series, "k", "ts", "vc", 100L)
      .orderBy(col("grid_ts"))
      .select(col("interp_c")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(100L), Some(200L), Some(300L)))
  }

  test("grid before the first observation is NULL; after the last holds") {
    // observation at t=150 only; grid points 100 (before) and 200 (after)
    val series = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:02:30"), 500L),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:03:30"), 700L))
      .toDF("k", "ts", "vc")
    val got = Resample.interpolateLinear(series, "k", "ts", "vc", 100L)
      .orderBy(col("grid_ts"))
      .select(col("grid_ts").cast("string"), col("interp_c")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // midnight is a step boundary, so the grid floors 150 s → 100 s
    // (00:01:40, before the first obs → NULL) and 200 s (00:03:20):
    // 500 + 200·50/60 = 666.67 → 666; nothing past hi = 210 s
    assert(got.toSeq === Seq(
      ("2024-01-01 00:01:40", None),
      ("2024-01-01 00:03:20", Some(666L))))
  }

  test("rounding truncates toward negative infinity consistently") {
    // 0→(t=0,v=0) and (t=300,v=100): grid 100 → 33.33 → 33; 200 → 66.67 → 66
    val series = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0L),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 100L))
      .toDF("k", "ts", "vc")
    val got = Resample.interpolateLinear(series, "k", "ts", "vc", 100L)
      .orderBy(col("grid_ts")).select("interp_c").as[Long].collect()
    assert(got.toSeq === Seq(0L, 33L, 66L, 100L))
  }
}
