package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C8 — fraud report assembly (reference main.py:531-560).
  *
  * fact LEFT JOIN current dims LEFT JOIN blacklist LEFT JOIN rule-4 set
  * LEFT JOIN rule-5 set, keep rows where any rule fires, project
  * (event_dt, passport, fio, phone, event_type, report_dt).
  *
  * Quirk §2.9.1: the reference references `h.deleted_flg` on a CTE that
  * doesn't expose that column (main.py:549) — PostgreSQL would reject the
  * statement as written. We drop that predicate: the rule-4 set was
  * already built from `deleted_flg = false` dims (main.py:423-426).
  */
object FraudReport {

  /** Exact event_type strings (main.py:537-542) — byte-for-byte. */
  val BlockedPassport  = "Заблокированный паспорт"
  val ExpiredPassport  = "Просроченный паспорт"
  val InvalidContract  = "Недействующий договор"
  val CrossCity        = "Транзакции из разных городов за короткое время"
  val BruteForce       = "Попытка перебора транзакций"

  def assemble(txn: DataFrame, cards: DataFrame, accounts: DataFrame,
               clients: DataFrame, blacklist: DataFrame,
               crossCitySet: DataFrame, bruteForceSet: DataFrame,
               reportDate: java.sql.Date): DataFrame = {
    def cur(dim: DataFrame) = dim.filter(!col("deleted_flg"))

    val car = cur(cards).select(col("card_num"), col("account_num"))
    val acc = cur(accounts).select(col("account_num"), col("client"),
      col("valid_to").as("acc_valid_to"))
    val cli = cur(clients).select(col("client_id"), col("first_name"),
      col("patrinymic"), col("last_name"), col("passport_num"),
      col("passport_valid_to"), col("phone"))
    val bl = blacklist.select(col("passport_num").as("bl_passport_num"))
    val h = crossCitySet.select(col("client_id").as("h_client_id"),
      col("trans_id").as("h_trans_id"))
    val r = bruteForceSet.select(col("client_id").as("r_client_id"),
      col("trans_id").as("r_trans_id"))

    // No forced join hints: dims and the blacklist auto-broadcast while
    // they fit the threshold (keeping the fact un-shuffled — the local
    // plans show BroadcastHashJoin), and degrade to shuffle joins when a
    // real-world dim outgrows executor memory. The rule sets are
    // fact-derived but heavily filtered — AQE sizes them at runtime.
    txn
      .join(car, Seq("card_num"), "left")
      .join(acc, Seq("account_num"), "left")
      .join(cli, col("client") === col("client_id"), "left")
      .join(bl, col("passport_num") === col("bl_passport_num"), "left")
      .join(h, col("h_client_id") === col("client_id") &&
        col("trans_id") === col("h_trans_id"), "left")
      .join(r, col("r_client_id") === col("client_id") &&
        col("trans_id") === col("r_trans_id"), "left")
      .filter(
        col("bl_passport_num").isNotNull ||
        col("passport_valid_to") < col("trans_date") ||
        col("acc_valid_to") < col("trans_date") ||
        col("h_client_id").isNotNull ||
        col("r_client_id").isNotNull)
      .select(
        col("trans_date").as("event_dt"),
        col("passport_num").as("passport"),
        // PG `||` null semantics: a NULL patronymic nulls the whole fio →
        // concat, NOT concat_ws (which skips nulls). Order F-P-L
        // (main.py:535).
        concat(col("first_name"), lit(" "), col("patrinymic"), lit(" "),
          col("last_name")).as("fio"),
        col("phone"),
        when(col("bl_passport_num").isNotNull, BlockedPassport)
          .when(col("passport_valid_to") < col("trans_date"), ExpiredPassport)
          .when(col("acc_valid_to") < col("trans_date"), InvalidContract)
          .when(col("h_client_id").isNotNull, CrossCity)
          .when(col("r_client_id").isNotNull, BruteForce)
          .as("event_type"),
        lit(reportDate).as("report_dt"))
  }
}
