package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Events

/** Funnel strict-sequence semantics and cohort retention cells. */
class EventsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict order, stalls recorded, out-of-order and pre-stage repeats ignored") {
    val events = Seq(
      // user 1 completes in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: click BEFORE first view — doesn't count; stalls at view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 09:30:00")),
      // user 3: purchase before click — stalls at click
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:10:00")),
      (3L, "click", ts("2024-01-01 08:20:00")),
      // user 4 never views — absent from the funnel
      (4L, "purchase", ts("2024-01-01 07:00:00")),
      // user 5: second click after view counts even though first was before
      (5L, "view", ts("2024-01-01 06:00:00")),
      (5L, "click", ts("2024-01-01 05:00:00")),
      (5L, "click", ts("2024-01-01 06:30:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getInt(4),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L))
    assert(out(1L) === ((3, Some(ts("2024-01-01 10:05:00")),
      Some(ts("2024-01-01 10:10:00")))))
    assert(out(2L)._1 === 1)
    assert(out(3L)._1 === 2 && out(3L)._2 === Some(ts("2024-01-01 08:20:00")))
    assert(out(5L)._1 === 2 && out(5L)._2 === Some(ts("2024-01-01 06:30:00")))
  }

  test("resampleFill: step-floored grid start, forward fill across gaps, single-event key") {
    val series = Seq(
      (1L, ts("2024-01-01 10:00:30"), 5.0),
      (1L, ts("2024-01-01 10:03:10"), 7.0),   // gap: 10:01 and 10:02 fill with 5.0
      (2L, ts("2024-01-01 00:00:00"), 9.0))   // single event, aligned
      .toDF("k", "ts", "v")
    val out = graft.ops.Resample.resampleFill(series, "k", "ts", Seq("v"), 60L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq(
      // grid floors to 10:00:00, BEFORE the first event — an honest
      // leading null, not a back-fill
      (1L, "2024-01-01 10:00:00.0", None),
      (1L, "2024-01-01 10:01:00.0", Some(5.0)),
      (1L, "2024-01-01 10:02:00.0", Some(5.0)),
      // the 10:03:10 event is after the 10:03 point — still the old value
      (1L, "2024-01-01 10:03:00.0", Some(5.0)),
      // aligned single event matches its own grid point (<=)
      (2L, "2024-01-01 00:00:00.0", Some(9.0))))
  }

  test("resampleFill floors the grid start for pre-epoch timestamps too") {
    val series = Seq((1L, ts("1969-12-31 23:59:30"), 4.0))
      .toDF("k", "ts", "v")
    val out = graft.ops.Resample.resampleFill(series, "k", "ts", Seq("v"), 60L)
      .collect().map(r => (r.getTimestamp(1).toString,
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // grid floors DOWN to 23:59:00 (truncation-toward-zero would round
    // up past the event and crash the sequence)
    assert(out.toSeq === Seq(("1969-12-31 23:59:00.0", None)))
  }

  test("cohort retention: cohorts by first date, distinct-daily activity cells") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")), // same cell
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-02 01:00:00")),
      (3L, ts("2024-01-02 09:00:00")))
      .toDF("user_id", "ts")
    val out = Events.cohortRetention(events, "user_id", "ts").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L),  // users 1,2 on their first day
      ("2024-01-01", 1, 1L),  // user 2 back next day
      ("2024-01-01", 2, 1L),  // user 1 back on day 2
      ("2024-01-02", 0, 1L))) // user 3's cohort
  }

  test("transitions: per-entity consecutive pairs, row-normalized e6") {
    val events = Seq(
      // user 1: a -> b -> a  (transitions a->b, b->a)
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (1L, 11L, "b", ts("2024-01-01 10:01:00")),
      (1L, 12L, "a", ts("2024-01-01 10:02:00")),
      // user 2: a -> b (one transition; no cross-user pair with user 1)
      (2L, 20L, "a", ts("2024-01-01 10:00:30")),
      (2L, 21L, "b", ts("2024-01-01 10:03:00")),
      // user 3: single event — no transitions
      (3L, 30L, "b", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.transitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 2L, 1000000L)),   // both a-transitions go to b
      ("b", "a") -> ((1L, 1L, 1000000L))))
  }

  test("transitions: same-second ties ordered by the tie column") {
    val events = Seq(
      (1L, 2L, "b", ts("2024-01-01 10:00:00")),
      (1L, 1L, "a", ts("2024-01-01 10:00:00")), // same second, lower id first
      (1L, 3L, "c", ts("2024-01-01 10:00:01")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Events.transitions(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a", "b"), ("b", "c")))
  }
}
