package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection for corpus curation — the scan side of the scrub
  * pipeline ([[TextAnalysis.redactPii]] is the rewrite side): per
  * document, COUNT the occurrences of each PII class so curation can
  * rank, audit, and threshold ("drop docs with any valid card number",
  * "route high-PII sources to review") without rewriting text.
  *
  * Patterns are the same deliberately PORTABLE subset the redactor uses
  * (plain character classes, bounded repetition, no backrefs /
  * lookarounds — identical semantics in Java regex and RE2/DuckDB, which
  * is what lets the oracle replay the scan). Card candidates are
  * additionally validated with the Luhn mod-10 checksum — the standard
  * separator of real card numbers from arbitrary 16-digit runs (ISO/IEC
  * 7812; the check digit makes random digit strings fail 90% of the
  * time) — computed entirely with codegen'd collection HOFs: no UDF, no
  * shuffle, embarrassingly parallel per row.
  */
object Pii {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val CardRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"

  /** Luhn mod-10 validity of the digit string inside `s` (separators
    * stripped first). From the rightmost digit, every second digit is
    * doubled with digit-sum folding (2·d − 9 when 2·d > 9); valid iff
    * the total ≡ 0 (mod 10). Empty/no-digit input is invalid. Pure
    * per-row HOF arithmetic over the reversed digit array — the
    * index comes from zip_with against a sequence, with the empty case
    * guarded (Spark's `sequence(0, -1)` DESCENDS rather than returning
    * an empty array). */
  def luhnValid(s: Column): Column = {
    val digits = filter(split(regexp_replace(s, "[^0-9]", ""), ""),
      d => length(d) === 1)
    val rev = reverse(digits)
    val total = aggregate(
      zip_with(rev, sequence(lit(0), greatest(size(rev) - 1, lit(0))),
        (d, i) => {
          val v = d.cast("int")
          when(i % 2 === 0, v)
            .otherwise(when(v * 2 > 9, v * 2 - 9).otherwise(v * 2))
        }),
      lit(0), (acc, x) => acc + coalesce(x, lit(0)))
    size(rev) >= 13 && size(rev) <= 19 && total % 10 === 0
  }

  /** Per-document PII class counts over `textCol`:
    * (doc_id, n_email, n_phone, n_ipv4, n_card_like, n_card_valid,
    * has_pii) — `n_card_like` counts 16-digit formatted runs,
    * `n_card_valid` the Luhn-passing subset, and `has_pii` is true when
    * any class (counting only VALID cards — formatted-but-invalid runs
    * are how random IDs look) hits. One codegen'd projection, no
    * shuffle: the scan composes with any downstream filter/aggregate at
    * corpus scale. */
  def scan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val cards = regexp_extract_all(txt, lit(CardRe), lit(0))
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(txt, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(txt, lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(txt, lit(Ipv4Re)).cast("long").as("n_ipv4"),
      size(cards).cast("long").as("n_card_like"),
      size(filter(cards, m => luhnValid(m))).cast("long").as("n_card_valid"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ipv4") +
          col("n_card_valid") > 0)
  }
}
