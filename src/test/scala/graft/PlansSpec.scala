package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BucketRangeJoin

/** The BucketRangeJoin optimizer rule: fires only on the J3 interval
  * shape under its conf flag, preserves the exact row multiset
  * (boundary-inclusive, sub-second, hot-key), and leaves ineligible
  * joins untouched. */
class PlansSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left events per key plus right probes placed ON both window
  // boundaries, just outside them, and at sub-second offsets
  private def fixture: (DataFrame, DataFrame) = {
    val l = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 10:07:33.250")),
      (3L, "k2", ts("2024-01-01 10:00:00")),
      (4L, "k3", ts("2023-12-31 23:59:59.999"))).toDF("lid", "key", "lts")
    val r = Seq(
      (10L, "k1", ts("2024-01-01 10:00:00")),         // == lts (lower edge)
      (11L, "k1", ts("2024-01-01 10:10:00")),         // == lts + w (upper edge)
      (12L, "k1", ts("2024-01-01 10:10:00.001")),     // just outside
      (13L, "k1", ts("2024-01-01 10:17:33.250")),     // == row2 upper edge
      (14L, "k2", ts("2024-01-01 10:09:59.999")),     // inside
      (15L, "k9", ts("2024-01-01 10:00:00")),         // key never matches
      (16L, "k3", ts("2024-01-01 00:09:59.999"))      // inside, crosses midnight
    ).toDF("rid", "key2", "rts")
    (l, r)
  }

  private def joined(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, $"key" === $"key2" &&
      $"rts".between($"lts", $"lts" + expr("INTERVAL 10 MINUTES")))
      .select($"lid", $"rid")

  private def withRule[T](body: => T): T = {
    spark.conf.set(BucketRangeJoin.ConfKey, "true")
    try body finally spark.conf.set(BucketRangeJoin.ConfKey, "false")
  }

  test("rule off by default: plan has no bucket attribute") {
    val (l, r) = fixture
    assert(!joined(l, r).queryExecution.optimizedPlan.toString.contains("_graft_ib"))
  }

  test("rule rewrites the J3 shape and preserves the exact row multiset") {
    val (l, r) = fixture
    val plain = joined(l, r).collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val (rewritten, plan) = withRule {
      val df = joined(l, r)
      (df.collect().map(x => (x.getLong(0), x.getLong(1))).sorted,
        df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("_graft_ib"), plan)
    assert(plan.contains("explode"), plan)
    assert(rewritten === plain)
    // boundary semantics sanity: both edges inclusive, outside excluded
    assert(plain.contains((1L, 10L)) && plain.contains((1L, 11L)))
    assert(!plain.contains((1L, 12L)))
    assert(plain.contains((2L, 13L)) && plain.contains((4L, 16L)))
  }

  test("ineligible joins are untouched: outer join, missing upper bound, non-constant window") {
    val (l, r) = fixture
    withRule {
      val outer = l.join(r, $"key" === $"key2" &&
        $"rts".between($"lts", $"lts" + expr("INTERVAL 10 MINUTES")), "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("_graft_ib"))
      val noUpper = l.join(r, $"key" === $"key2" && $"rts" >= $"lts")
      assert(!noUpper.queryExecution.optimizedPlan.toString.contains("_graft_ib"))
      val rWin = r.withColumn("w", lit(600))
      val nonConst = l.join(rWin, $"key" === $"key2" && $"rts" >= $"lts" &&
        $"rts" <= $"lts" + $"w".cast("int") * expr("INTERVAL 1 SECONDS"))
      assert(!nonConst.queryExecution.optimizedPlan.toString.contains("_graft_ib"))
    }
  }

  test("sql functions are injected via extensions in this test session") {
    val expected = (((97L * 31 + 98) * 31 + 99) % 1000000007) |
      ((((97L * 37 + 98) * 37 + 99) % 998244353) << 32)
    assert(spark.sql("SELECT portable_hash62('abc') AS h").head().getLong(0) === expected)
  }
}
