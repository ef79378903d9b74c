package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Backward as-of join semantics: latest-at-or-before match per key,
  * left rows always survive, tolerance nulls stale matches, and equal-ts
  * right duplicates resolve deterministically. */
class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    // key, ts, px
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:30:00"), 105.0),
    ("B", ts("2024-01-01 09:00:00"), 50.0)
  ).toDF("sym", "qts", "px")

  private val trades = Seq(
    ("A", ts("2024-01-01 10:04:59"), 1L), // between quotes → 100.0
    ("A", ts("2024-01-01 10:05:00"), 2L), // exactly at a quote → 101.0 (<=)
    ("A", ts("2024-01-01 11:00:00"), 3L), // after all → 105.0
    ("B", ts("2024-01-01 08:59:59"), 4L), // before any → null
    ("C", ts("2024-01-01 12:00:00"), 5L)  // key with no quotes → null
  ).toDF("sym", "tts", "trade_id")

  test("latest-at-or-before match per key; unmatched rows survive with nulls") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"trade_id", $"r_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(101.0),
      3L -> Some(105.0), 4L -> None, 5L -> None))
  }

  test("tolerance nulls out stale matches but keeps the row") {
    // trade 1's match is 299 s old (kept at 300 s tolerance), trade 3's
    // is 30 min old (dropped)
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts",
        Seq("px"), tolerance = Some(300L))
      .select($"trade_id", $"r_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(101.0),
      3L -> None, 4L -> None, 5L -> None))
  }

  test("equal-ts right duplicates resolve to the field-wise greatest payload") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 9.0)).toDF("sym", "qts", "px")
    val oneTrade = Seq(("A", ts("2024-01-01 10:01:00"), 1L))
      .toDF("sym", "tts", "trade_id")
    val out = AsOfJoin.asOf(oneTrade, dupQuotes, Seq("sym"), "tts", "qts", Seq("px"))
      .select($"r_px").collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(9.0))
  }

  test("left payload columns pass through untouched") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    assert(out.columns.toSeq === Seq("sym", "tts", "trade_id", "r_qts", "r_px"))
    assert(out.count() === trades.count())
  }
}
