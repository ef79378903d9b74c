package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SnapshotDiff

/** Snapshot differencing: change classification, null-safe column
  * comparison, and the null-key presence distinction. */
class SnapshotDiffSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def run(oldRows: Seq[(Long, Option[String], Option[Int])],
                  newRows: Seq[(Long, Option[String], Option[Int])]) = {
    val o = oldRows.toDF("k", "seg", "nat")
    val n = newRows.toDF("k", "seg", "nat")
    SnapshotDiff.diff(o, n, Seq("k"), Seq("seg", "nat"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
  }

  test("insert/update/delete classified; unchanged rows dropped; changed_cols named") {
    val out = run(
      oldRows = Seq((1L, Some("A"), Some(10)), (2L, Some("B"), Some(20)),
        (3L, Some("C"), Some(30)), (4L, Some("D"), Some(40))),
      newRows = Seq((1L, Some("A"), Some(10)),          // unchanged → absent
        (2L, Some("B2"), Some(20)),                     // one col changed
        (3L, Some("C2"), Some(31)),                     // both cols changed
        (5L, Some("E"), Some(50))))                     // new key
    assert(out === Seq(
      (2L, "update", "seg"),
      (3L, "update", "seg,nat"),
      (4L, "delete", ""),
      (5L, "insert", "")))
  }

  test("null-safe comparison: null↔null unchanged, null↔value is a change") {
    val out = run(
      oldRows = Seq((1L, None, Some(1)), (2L, None, Some(2)), (3L, Some("x"), None)),
      newRows = Seq((1L, None, Some(1)), (2L, Some("now"), Some(2)), (3L, None, None)))
    assert(out === Seq((2L, "update", "seg"), (3L, "update", "seg")))
  }

  test("identical snapshots produce an empty changeset") {
    val rows = Seq((1L, Some("A"), Some(1)), (2L, Some("B"), None))
    assert(run(rows, rows).isEmpty)
  }

  test("a NULL key is a real key (presence flags, not key-null checks)") {
    val o = Seq((Option.empty[Long], "old")).toDF("k", "seg")
    val n = Seq((Option.empty[Long], "new")).toDF("k", "seg")
    val out = SnapshotDiff.diff(o, n, Seq("k"), Seq("seg")).collect()
      .map(r => (r.isNullAt(0), r.getString(1), r.getString(2)))
    // the null-keyed row matched itself across snapshots → update, not
    // a spurious insert+delete pair
    assert(out.toSeq === Seq((true, "update", "seg")))
  }

  test("changes/applyChanges round trip reconstructs the new snapshot exactly") {
    val o = Seq((1L, "keep"), (2L, "old"), (3L, "gone")).toDF("k", "seg")
    val n = Seq((1L, "keep"), (2L, "new"), (4L, "fresh")).toDF("k", "seg")
    val cs = SnapshotDiff.changes(o, n, Seq("k"), Seq("seg"))
    val byType = cs.collect()
      .map(r => r.getString(1) -> (r.getLong(0), Option(r.getString(2)))).toSeq
      .groupMap(_._1)(_._2)
    assert(byType("update") === Seq((2L, Some("new"))))
    assert(byType("insert") === Seq((4L, Some("fresh"))))
    assert(byType("delete") === Seq((3L, None))) // deletes carry no values
    val rebuilt = SnapshotDiff.applyChanges(o, cs, Seq("k"), Seq("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rebuilt === Set((1L, "keep"), (2L, "new"), (4L, "fresh")))
  }

  test("applyChanges retires a NULL-keyed row null-safely") {
    val o = Seq((Option.empty[Long], "old"), (Some(1L), "a")).toDF("k", "seg")
    val n = Seq((Option.empty[Long], "new"), (Some(1L), "a")).toDF("k", "seg")
    val cs = SnapshotDiff.changes(o, n, Seq("k"), Seq("seg"))
    val rebuilt = SnapshotDiff.applyChanges(o, cs, Seq("k"), Seq("seg"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toSet
    // the equality anti-join would keep the stale null-keyed "old" row
    // AND add "new" — the null-safe condition replaces it instead
    assert(rebuilt === Set((None, "new"), (Some(1L), "a")))
  }
}
