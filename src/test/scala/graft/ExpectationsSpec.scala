package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Expectations
import graft.ops.Expectations.Rule

/** One-pass batch validation: 3VL handling, split consistency, single-job
  * metrics, and the non-row-local helpers. */
class ExpectationsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(5.0), Some("click")),
    (2L, Some(-1.0), Some("click")),     // range violation
    (3L, Some(5.0), Some("bogus")),      // set violation
    (4L, Option.empty[Double], Some("click")), // NULL predicate → violation
    (5L, Some(100.0), Option.empty[String]))   // both rules violated
    .toDF("id", "value", "etype")

  private val rules = Seq(
    Expectations.between("value", 0, 50),
    Expectations.inSet("etype", Seq("click", "view")))

  test("annotate: violation lists in rule order; NULL predicates are violations") {
    val out = Expectations.annotate(df, rules).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](3)).toMap
    assert(out(1L) === Seq())
    assert(out(2L) === Seq("value_between"))
    assert(out(3L) === Seq("etype_in_set"))
    assert(out(4L) === Seq("value_between"))
    assert(out(5L) === Seq("value_between", "etype_in_set"))
  }

  test("clean + quarantine partition the batch; clean keeps the original schema") {
    val cl = Expectations.clean(df, rules)
    val qr = Expectations.quarantine(df, rules)
    assert(cl.columns.toSeq === df.columns.toSeq)
    assert(cl.collect().map(_.getLong(0)).toSet === Set(1L))
    assert(qr.collect().map(_.getLong(0)).toSet === Set(2L, 3L, 4L, 5L))
    assert(cl.count() + qr.count() === df.count())
  }

  test("metrics: one row per rule, counts match the annotation") {
    val m = Expectations.metrics(df, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq === Seq(("value_between", 5L, 3L), ("etype_in_set", 5L, 2L)))
  }

  test("explicitly-nullable rule: isNull || predicate passes absent values") {
    val r = Seq(Rule("value_opt_range", col("value").isNull || col("value") >= 0))
    val bad = Expectations.quarantine(df, r).collect().map(_.getLong(0))
    assert(bad.toSeq === Seq(2L)) // row 4 (NULL) passes now
  }

  test("reserved output columns are rejected; empty batches report zero violations") {
    val clash = Seq((1L, true)).toDF("id", "is_valid")
    val e = intercept[IllegalArgumentException] {
      Expectations.annotate(clash, Seq(Expectations.notNull("id")))
    }
    assert(e.getMessage.contains("reserved"))
    val empty = df.filter(col("id") < 0)
    val m = Expectations.metrics(empty, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq === Seq(("value_between", 0L, 0L), ("etype_in_set", 0L, 0L)))
  }

  test("duplicateKeys and danglingKeys surface the non-row-local violations") {
    val d = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val dups = Expectations.duplicateKeys(d, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.toSeq === Seq((1L, 2L)))

    val ref = Seq(1L, 2L).toDF("rk")
    val facts = Seq((10L, Some(1L)), (11L, Some(9L)), (12L, Option.empty[Long]))
      .toDF("id", "fk")
    val dangling = Expectations.danglingKeys(facts, "fk", ref, "rk")
      .collect().map(_.getLong(0))
    assert(dangling.toSeq === Seq(9L)) // NULL fk skipped by contract
  }
}
