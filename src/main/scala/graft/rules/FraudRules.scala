package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** C3-C7 — the five fraud rules (SURVEY.md §2.8). Rules 1-3 are pure
  * predicates evaluated inside the report assembly (FraudReport); rules 4
  * and 5 build flagged-transaction sets here.
  *
  * All dim inputs are the SCD2 history tables; every consumer filters
  * `deleted_flg = false` to get current versions (main.py:423-426), which
  * on our history layout equals `effective_to = '3000-01-01'`.
  */
object FraudRules {

  private def current(dim: DataFrame): DataFrame =
    dim.filter(!col("deleted_flg"))

  /** J1 — star flatten: fact→cards→accounts→clients, current versions
    * only — the shared core of both `city_of_transactions` (main.py:422-426)
    * and `req_start_for_4_rule` (main.py:438-443; no terminals join there).
    * Dims are projected to their join/output columns; the join strategy is
    * deliberately NOT hinted: when a dim fits the broadcast threshold AQE
    * broadcasts it (the local plans show BroadcastHashJoin), and a
    * 100M-row client dim falls back to a shuffle join instead of being
    * forced into executor memory by a stale hint. */
  def txnWithClient(txn: DataFrame, cards: DataFrame, accounts: DataFrame,
                    clients: DataFrame): DataFrame =
    txn
      .join(current(cards).select("card_num", "account_num"), Seq("card_num"))
      .join(current(accounts).select(col("account_num"), col("client")), Seq("account_num"))
      .join(current(clients).select(col("client_id"), col("passport_num")),
        col("client") === col("client_id"))
      .select("card_num", "trans_id", "trans_date", "amt", "oper_result",
        "terminal", "client_id", "passport_num")

  /** city_of_transactions (main.py:415-427): the client-resolved fact plus
    * the terminal city. */
  def cityOfTransactions(withClient: DataFrame, terminals: DataFrame): DataFrame =
    withClient
      .join(current(terminals).select(col("terminal_id"), col("terminal_city")),
        col("terminal") === col("terminal_id"))
      .select("card_num", "trans_id", "trans_date", "terminal_city", "client_id")

  /** C6 / Rule 4 — cross-city within one hour (main.py:428-436): self-join
    * on card_num, different terminal cities, |Δt| ≤ 3600 s; DISTINCT
    * (trans_id, client_id); symmetric, so both transactions of a pair are
    * flagged. Equi-join on card_num keeps it hash/SMJ-able; the city and
    * time deltas are residual filters (SURVEY §2.3 J2). */
  def crossCityRule(cityTxn: DataFrame): DataFrame = {
    val a = cityTxn.alias("a")
    val b = cityTxn.select("card_num", "trans_date", "terminal_city").alias("b")
    a.join(b, col("a.card_num") === col("b.card_num") &&
        col("a.terminal_city") =!= col("b.terminal_city") &&
        abs(unix_timestamp(col("a.trans_date")) - unix_timestamp(col("b.trans_date"))) <= 3600)
      .select(col("a.trans_id").as("trans_id"), col("a.client_id").as("client_id"))
      .distinct()
  }

  /** C7 / Rule 5 — amount brute-force (main.py:437-530). Per (client,
    * start-txn): every fact transaction opens a candidate 20-minute window
    * [t0, t0+20min] (the start row joins itself — r1=r2 satisfies the
    * BETWEEN, main.py:456). A window qualifies when it holds ≥4
    * transactions including both a SUCCESS and a REJECT (main.py:458-467),
    * its first 4 rows by time have strictly time-decreasing amounts
    * (rn_amt = rn_datetime ∀4, main.py:483-493) and results
    * REJECT,REJECT,REJECT,SUCCESS (the INTERSECT chain, main.py:494-522).
    * Flags the START transaction (main.py:523-530).
    *
    * The reference's W1/W2 + INTERSECT×3 + re-join pipeline collapses here
    * into the two row_numbers plus ONE conditional aggregation over
    * (client_id, trans_id_start) — same set, one shuffle instead of five
    * self-joins (rewrite documented in SURVEY §2.6 O4 / §7.4). Ties in
    * either row_number are broken by trans_id_20min for determinism
    * (reference is nondeterministic on ties, SURVEY §2.9.3).
    *
    * Returns (client_id, trans_id) of flagged start transactions. */
  def bruteForceRule(txnWithClient: DataFrame): DataFrame = {
    val r1 = txnWithClient.select(
      col("client_id"), col("trans_id").as("trans_id_start"),
      col("trans_date").as("trans_date_start"))
    val r2 = txnWithClient.select(
      col("client_id"), col("trans_id").as("trans_id_20min"),
      col("amt").as("amt_20min"), col("trans_date").as("trans_date_20min"),
      col("oper_result"))
    // Time-bucketed interval join (ops.IntervalJoin): the plain equi-join
    // on client_id builds a per-client cross product before the range
    // filter — with few hot clients that's quadratic on one reducer. The
    // bucketed form joins on (client_id, time-cell) with fixed 2× fan-out.
    val joined = graft.ops.IntervalJoin.joinWithin(
      r1, r2, "client_id", "trans_date_start", "trans_date_20min", 1200L)

    val byGroup = Window.partitionBy("client_id", "trans_id_start")
    val rnTime = row_number().over(
      byGroup.orderBy(col("trans_date_20min").asc, col("trans_id_20min").asc))
    // rn_amt ranks amounts among ONLY the first 4 rows by time — the
    // reference computes it after the `rn_datetime in (1,2,3,4)` filter
    // (main.py:475-482) — so it must be applied post-filter here too.
    val rnAmt = row_number().over(
      byGroup.orderBy(col("amt_20min").desc, col("trans_id_20min").asc))

    // Group qualification (A1+A2, main.py:458-467) is over the WHOLE
    // window, so carry it via window aggregates before the rn≤4 filter.
    // Windows + final groupBy all partition on (client_id, trans_id_start)
    // → one shuffle end to end.
    joined
      .select(col("*"),
        rnTime.as("rn_datetime"),
        // one select → the three same-spec aggregates fuse into a single
        // Window op (a withColumn chain leaves them as separate passes)
        count(lit(1)).over(byGroup).as("cnt"),
        max(when(col("oper_result") === "SUCCESS", 1).otherwise(0))
          .over(byGroup).as("has_success"),
        max(when(col("oper_result") === "REJECT", 1).otherwise(0))
          .over(byGroup).as("has_reject"))
      .filter(col("rn_datetime") <= 4 && col("cnt") > 3 &&
        col("has_success") === 1 && col("has_reject") === 1)
      .withColumn("rn_amt", rnAmt)
      .groupBy(col("client_id"), col("trans_id_start"))
      .agg(
        sum(when(col("rn_amt") === col("rn_datetime"), 1).otherwise(0))
          .as("amt_sorted_cnt"),
        max(when(col("rn_datetime") === 1, col("oper_result"))).as("res1"),
        max(when(col("rn_datetime") === 2, col("oper_result"))).as("res2"),
        max(when(col("rn_datetime") === 3, col("oper_result"))).as("res3"),
        max(when(col("rn_datetime") === 4, col("oper_result"))).as("res4"))
      .filter(col("amt_sorted_cnt") === 4 &&
        col("res1") === "REJECT" && col("res2") === "REJECT" &&
        col("res3") === "REJECT" && col("res4") === "SUCCESS")
      .select(col("client_id"), col("trans_id_start").as("trans_id"))
  }
}
