package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.FraudRules
import java.sql.Timestamp

/** C6/C7 — the two set-producing fraud rules on minimal positive and
  * near-miss fixtures (FIXTURES.md A5). */
class FraudRulesSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---------------------------------------------------------------- C6

  private val citySchema = StructType(Seq(
    StructField("card_num", StringType), StructField("trans_id", StringType),
    StructField("trans_date", TimestampType), StructField("terminal_city", StringType),
    StructField("client_id", StringType)))

  private def cityDf(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), citySchema)

  test("C6: same card, different cities, 30 min apart → BOTH txns flagged") {
    val out = FraudRules.crossCityRule(cityDf(
      Row("K5", "T1", ts("2021-01-01 10:00:00"), "X", "C5"),
      Row("K5", "T2", ts("2021-01-01 10:30:00"), "Y", "C5")))
    assert(out.collect().toSet === Set(Row("T1", "C5"), Row("T2", "C5")))
  }

  test("C6: 61 minutes apart → not flagged; same city → not flagged; boundary 60 min → flagged") {
    val out = FraudRules.crossCityRule(cityDf(
      Row("K6", "A", ts("2021-01-01 10:00:00"), "X", "C6"),
      Row("K6", "B", ts("2021-01-01 11:01:00"), "Y", "C6"),   // 61 min
      Row("K7", "C", ts("2021-01-01 10:00:00"), "X", "C7"),
      Row("K7", "D", ts("2021-01-01 10:30:00"), "X", "C7"),   // same city
      Row("K8", "E", ts("2021-01-01 10:00:00"), "X", "C8"),
      Row("K8", "F", ts("2021-01-01 11:00:00"), "Y", "C8")))  // exactly 1 h → <=
    assert(out.collect().toSet === Set(Row("E", "C8"), Row("F", "C8")))
  }

  test("C6: different cards never pair") {
    val out = FraudRules.crossCityRule(cityDf(
      Row("K1", "A", ts("2021-01-01 10:00:00"), "X", "C1"),
      Row("K2", "B", ts("2021-01-01 10:10:00"), "Y", "C2")))
    assert(out.count() === 0)
  }

  // ---------------------------------------------------------------- C7

  private val txnSchema = StructType(Seq(
    StructField("client_id", StringType), StructField("trans_id", StringType),
    StructField("trans_date", TimestampType),
    StructField("amt", DecimalType(18, 2)), StructField("oper_result", StringType)))

  private def txnDf(rows: (String, String, String, String, String)*) =
    spark.createDataFrame(java.util.Arrays.asList(rows.map { case (c, t, d, a, r) =>
      Row(c, t, ts(d), new java.math.BigDecimal(a), r) }: _*), txnSchema)

  private val positive = Seq(
    ("C7", "T1", "2021-01-01 12:00:00", "100.00", "REJECT"),
    ("C7", "T2", "2021-01-01 12:05:00", "75.00", "REJECT"),
    ("C7", "T3", "2021-01-01 12:10:00", "50.00", "REJECT"),
    ("C7", "T4", "2021-01-01 12:15:00", "25.00", "SUCCESS"))

  test("C7 positive: 4 txns in 20 min, decreasing amounts, R,R,R,S → START txn flagged") {
    val out = FraudRules.bruteForceRule(txnDf(positive: _*))
    assert(out.collect().toSet === Set(Row("C7", "T1")))
  }

  test("C7 near-miss: amounts not time-decreasing → not flagged") {
    val bad = positive.updated(2, ("C7", "T3", "2021-01-01 12:10:00", "80.00", "REJECT"))
    assert(FraudRules.bruteForceRule(txnDf(bad: _*)).count() === 0)
  }

  test("C7 near-miss: pattern R,R,S,S → not flagged") {
    val bad = positive.updated(2, ("C7", "T3", "2021-01-01 12:10:00", "50.00", "SUCCESS"))
    assert(FraudRules.bruteForceRule(txnDf(bad: _*)).count() === 0)
  }

  test("C7 near-miss: 4th txn at minute 21 → window holds only 3 → not flagged") {
    val bad = positive.updated(3, ("C7", "T4", "2021-01-01 12:21:00", "25.00", "SUCCESS"))
    assert(FraudRules.bruteForceRule(txnDf(bad: _*)).count() === 0)
  }

  test("C7 near-miss: only 3 txns → not flagged") {
    assert(FraudRules.bruteForceRule(txnDf(positive.take(3): _*)).count() === 0)
  }

  test("C7: boundary — 4th txn at exactly +20 min is inside (BETWEEN inclusive)") {
    val edge = positive.updated(3, ("C7", "T4", "2021-01-01 12:20:00", "25.00", "SUCCESS"))
    assert(FraudRules.bruteForceRule(txnDf(edge: _*)).collect().toSet === Set(Row("C7", "T1")))
  }

  test("C7: a 5th later high-amount txn in-window does not disturb the first-4 pattern") {
    val plus = positive :+ ("C7", "T5", "2021-01-01 12:18:00", "999.00", "SUCCESS")
    // T5 at 12:18 sorts 5th by time? No — 12:18 < T4's 12:15? It's after; order
    // T1..T3, T4(12:15), T5(12:18): first four are T1-T4 and rn_amt among
    // them ignores T5 (reference computes rn_amt after the rn<=4 filter).
    assert(FraudRules.bruteForceRule(txnDf(plus: _*)).collect().toSet === Set(Row("C7", "T1")))
  }
}
