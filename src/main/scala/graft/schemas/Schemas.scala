package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table in the warehouse.
  *
  * The reference declares a fixed schema up front (reference main.ddl:1-124)
  * and reads files with positional/named mapping plus renames
  * (main.py:98-113). We mirror that: no schema inference on the production
  * path — every read supplies one of these StructTypes.
  *
  * Type mapping (SURVEY.md §1.2): VARCHAR→StringType (ids stay strings),
  * DATE→DateType, TIMESTAMP→TimestampType (session TZ pinned UTC),
  * DECIMAL→DecimalType(18,2) for money, BOOL→BooleanType.
  */
object Schemas {

  /** Sentinel open-end date for SCD2 rows (main.py:138 `'3000-01-01'::DATE`). */
  val OpenEndDate: java.sql.Date = java.sql.Date.valueOf("3000-01-01")

  // ---------------------------------------------------------------- staging

  /** main.ddl:14-23. Note `patrinymic` [sic] — typo preserved for fidelity
    * (source column `patronymic` renamed at main.py:70). */
  val stgClients: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("last_name", StringType),
    StructField("first_name", StringType),
    StructField("patrinymic", StringType),
    StructField("date_of_birth", DateType),
    StructField("passport_num", StringType),
    StructField("passport_valid_to", DateType),
    StructField("phone", StringType)))

  /** main.ddl:25-30 (source `account` renamed `account_num`, main.py:81). */
  val stgAccounts: StructType = StructType(Seq(
    StructField("account_num", StringType),
    StructField("valid_to", DateType),
    StructField("client", StringType)))

  /** main.ddl:32-36 (source `account` renamed `account_num`, main.py:91). */
  val stgCards: StructType = StructType(Seq(
    StructField("card_num", StringType),
    StructField("account_num", StringType)))

  /** main.ddl:2-7. */
  val stgTerminals: StructType = StructType(Seq(
    StructField("terminal_id", StringType),
    StructField("terminal_type", StringType),
    StructField("terminal_city", StringType),
    StructField("terminal_address", StringType)))

  /** main.ddl:38-48. `amt` is money → DecimalType(18,2); the raw CSV uses a
    * decimal comma (main.py:103 `decimal=","`) so the source read keeps it
    * as string and normalizes before cast (io.Sources). */
  val stgTransactions: StructType = StructType(Seq(
    StructField("trans_id", StringType),
    StructField("trans_date", TimestampType),
    StructField("card_num", StringType),
    StructField("oper_type", StringType),
    StructField("amt", DecimalType(18, 2)),
    StructField("oper_result", StringType),
    StructField("terminal", StringType)))

  /** main.ddl:9-12 (file cols `passport`,`date` renamed, main.py:112-113). */
  val stgBlacklist: StructType = StructType(Seq(
    StructField("passport_num", StringType),
    StructField("entry_dt", DateType)))

  // ------------------------------------------------------------------- DWH

  private val scd2Cols = Seq(
    StructField("effective_from", DateType),
    StructField("effective_to", DateType),
    StructField("deleted_flg", BooleanType))

  /** main.ddl:68-82. */
  val dimClientsHist: StructType = StructType(stgClients.fields ++ scd2Cols)
  /** main.ddl:84-93. */
  val dimAccountsHist: StructType = StructType(stgAccounts.fields ++ scd2Cols)
  /** main.ddl:95-103. */
  val dimCardsHist: StructType = StructType(stgCards.fields ++ scd2Cols)
  /** main.ddl:51-60. */
  val dimTerminalsHist: StructType = StructType(stgTerminals.fields ++ scd2Cols)

  /** main.ddl:105-115 — same shape as staging transactions. */
  val factTransactions: StructType = stgTransactions
  /** main.ddl:62-66. */
  val factPassportBlacklist: StructType = stgBlacklist

  // ---------------------------------------------------------------- report

  /** main.ddl:117-124. */
  val repFraud: StructType = StructType(Seq(
    StructField("event_dt", TimestampType),
    StructField("passport", StringType),
    StructField("fio", StringType),
    StructField("phone", StringType),
    StructField("event_type", StringType),
    StructField("report_dt", DateType)))

  // ----------------------------------------------------------- raw sources

  /** `transactions_{date}.txt` header columns, in file order (main.py:105).
    * `amount` arrives as string with a decimal comma. */
  val rawTransactionsCsv: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("transaction_date", TimestampType),
    StructField("card_num", StringType),
    StructField("oper_type", StringType),
    StructField("amount", StringType),
    StructField("oper_result", StringType),
    StructField("terminal", StringType)))

  /** `passport_blacklist_{date}` columns (main.py:112). */
  val rawBlacklist: StructType = StructType(Seq(
    StructField("passport", StringType),
    StructField("date", DateType)))

  /** Source `info.clients` shape before the patronymic rename (main.py:65-74). */
  val srcClients: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("last_name", StringType),
    StructField("first_name", StringType),
    StructField("patronymic", StringType),
    StructField("date_of_birth", DateType),
    StructField("passport_num", StringType),
    StructField("passport_valid_to", DateType),
    StructField("phone", StringType)))

  /** Source `info.accounts` shape (main.py:79-84). */
  val srcAccounts: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("valid_to", DateType),
    StructField("client", StringType)))

  /** Source `info.cards` shape (main.py:88-92). */
  val srcCards: StructType = StructType(Seq(
    StructField("card_num", StringType),
    StructField("account", StringType)))
}
