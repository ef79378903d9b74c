package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C2 — fact loads (SURVEY.md §2.8).
  *
  * Transactions: the reference blindly appends staging to the fact table
  * (main.py:397-408). Blacklist: anti-join dedup — only passports not
  * already present are inserted, keyed on `passport_num` alone even though
  * the PK is (passport_num, entry_dt) (main.py:382-393, quirk SURVEY
  * §2.9.4 — first entry wins; preserved).
  */
object FactLoader {

  /** New transaction fact rows = staging as-is (main.py:397-408). */
  def transactionRows(staging: DataFrame): DataFrame = staging

  /** New blacklist fact rows: staging anti-joined against the existing
    * fact on passport_num only (main.py:388-391). The existing side is
    * projected to its key column before the join so the build side stays
    * minimal; AQE picks broadcast vs shuffle by actual size (the
    * accumulated fact can outgrow a fixed broadcast hint). */
  def blacklistRows(staging: DataFrame, existing: DataFrame): DataFrame =
    staging.join(existing.select(col("passport_num")),
      Seq("passport_num"), "left_anti")
}
