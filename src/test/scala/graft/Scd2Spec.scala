package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Scd2
import graft.schemas.Schemas
import java.sql.Date

/** C1 — SCD2 merge semantics (reference main.py:121-198): init load,
  * attribute change, new key, unchanged, null-attr no-op (null-rejecting
  * `<>`, SURVEY §2.9.8), missing-key passthrough, idempotence, and the
  * one-open-row invariant. */
class Scd2Spec extends AnyFunSuite with SparkTestSession {
  import Scd2.DimSpec

  private val spec = DimSpec("id", Seq("attr1", "attr2"))
  private val open = Date.valueOf("3000-01-01")
  private val d1 = Date.valueOf("2021-01-01")
  private val d2 = Date.valueOf("2021-01-02")

  private val dimSchema = StructType(Seq(
    StructField("id", StringType), StructField("attr1", StringType),
    StructField("attr2", StringType), StructField("effective_from", DateType),
    StructField("effective_to", DateType), StructField("deleted_flg", BooleanType)))
  private val stgSchema = StructType(dimSchema.fields.take(3))

  private def dim(rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), dimSchema)
  private def stg(rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), stgSchema)
  private def emptyDim: DataFrame = dim()

  private def rowset(df: DataFrame): Set[Row] = df.collect().toSet

  test("empty dim → initial full load with [date, open) and deleted_flg=false") {
    val out = Scd2.merge(emptyDim, stg(Row("a", "x", "y"), Row("b", "p", "q")), spec, d1)
    assert(rowset(out) === Set(
      Row("a", "x", "y", d1, open, false),
      Row("b", "p", "q", d1, open, false)))
  }

  test("changed attribute → old row closed (deleted_flg=true) + new open version") {
    val cur = dim(Row("a", "x", "y", d1, open, false))
    val out = Scd2.merge(cur, stg(Row("a", "x", "CHANGED")), spec, d2)
    assert(rowset(out) === Set(
      Row("a", "x", "y", d1, d2, true),
      Row("a", "x", "CHANGED", d2, open, false)))
  }

  test("new key → inserted; existing unchanged key → untouched") {
    val cur = dim(Row("a", "x", "y", d1, open, false))
    val out = Scd2.merge(cur, stg(Row("a", "x", "y"), Row("b", "p", "q")), spec, d2)
    assert(rowset(out) === Set(
      Row("a", "x", "y", d1, open, false),
      Row("b", "p", "q", d2, open, false)))
  }

  test("NULL attribute on either side never counts as changed (null-rejecting <>)") {
    val cur = dim(
      Row("a", null, "y", d1, open, false),   // dim null vs staging value
      Row("b", "p", "q", d1, open, false))    // staging null vs dim value
    val out = Scd2.merge(cur, stg(Row("a", "x", "y"), Row("b", null, "q")), spec, d2)
    assert(rowset(out) === rowset(cur))
  }

  test("key missing from staging stays open (no deletion detection)") {
    val cur = dim(Row("a", "x", "y", d1, open, false))
    val out = Scd2.merge(cur, stg(Row("b", "p", "q")), spec, d2)
    assert(rowset(out) === Set(
      Row("a", "x", "y", d1, open, false),
      Row("b", "p", "q", d2, open, false)))
  }

  test("already-closed history passes through untouched") {
    val cur = dim(
      Row("a", "old", "old", d1, d2, true),
      Row("a", "x", "y", d2, open, false))
    val out = Scd2.merge(cur, stg(Row("a", "x", "z")), spec, Date.valueOf("2021-01-03"))
    val d3 = Date.valueOf("2021-01-03")
    assert(rowset(out) === Set(
      Row("a", "old", "old", d1, d2, true),
      Row("a", "x", "y", d2, d3, true),
      Row("a", "x", "z", d3, open, false)))
  }

  test("merge is idempotent on an unchanged snapshot") {
    val s = stg(Row("a", "x", "y"), Row("b", "p", "q"))
    val once = Scd2.merge(emptyDim, s, spec, d1)
    val twice = Scd2.merge(once, s, spec, d2)
    assert(rowset(twice) === rowset(once))
  }

  test("invariant: exactly one open row per key after a merge chain") {
    val s1 = stg(Row("a", "1", "1"), Row("b", "1", "1"))
    val s2 = stg(Row("a", "2", "1"), Row("b", "1", "1"), Row("c", "1", "1"))
    val s3 = stg(Row("a", "3", "1"), Row("c", "2", "1"))
    val end = Scd2.merge(Scd2.merge(Scd2.merge(emptyDim, s1, spec, d1), s2, spec, d2),
      s3, spec, Date.valueOf("2021-01-03"))
    val openCounts = end.filter(end("effective_to") === open)
      .groupBy("id").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(openCounts === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // and full history for a: 3 versions
    assert(end.filter(end("id") === "a").count() === 3)
  }

  test("reference dim specs cover the four dims' key/attr lists") {
    assert(Scd2.clients.key === "client_id" && Scd2.clients.attrs.size === 7)
    assert(Scd2.accounts.key === "account_num" && Scd2.accounts.attrs === Seq("valid_to", "client"))
    assert(Scd2.cards.key === "card_num" && Scd2.cards.attrs === Seq("account_num"))
    assert(Scd2.terminals.key === "terminal_id" && Scd2.terminals.attrs.size === 3)
  }

  test("asOf selects by interval: successor wins on the boundary date, closed flag ignored") {
    val hist = dim(
      Row("a", "v1", "x", Date.valueOf("2020-01-01"), d1, true),   // closed at d1
      Row("a", "v2", "x", d1, open, false))                        // successor from d1
    def ids(d: Date) = Scd2.asOf(hist, d).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ids(Date.valueOf("2020-06-15")) === Seq(("a", "v1")))   // closed row still visible
    assert(ids(d1) === Seq(("a", "v2")))                           // boundary → successor
    assert(ids(Date.valueOf("2019-12-31")).isEmpty)                // before first version
  }
}
