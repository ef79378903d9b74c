package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract check a pipeline
  * runs before trusting a batch (the engine-side generalization of the
  * reference's implicit assumptions: non-null keys, parseable dates,
  * amounts in range — which it never validates and silently corrupts on
  * when violated). A batch of rules is evaluated in ONE pass: every
  * rule becomes a codegen'd boolean expression on the row, the
  * violation set is an array column, and the clean/quarantine split and
  * the per-rule metrics both derive from that single annotation — no
  * per-rule job loop, no second scan per constraint.
  *
  * Row-local rules (null / range / set / pattern / cross-column) are
  * plain `Column` predicates. The two genuinely non-row-local checks —
  * key uniqueness and referential integrity — can't be a row expression
  * and are provided as separate helpers with their own (minimal,
  * key-only) shuffles.
  */
object Expectations {

  /** A named expectation: `predicate` must evaluate true for a row to
    * pass. A NULL predicate result (SQL 3VL — e.g. `col > 0` on a NULL)
    * counts as a VIOLATION: an expectation is an assertion, and
    * "unknown" is not "proven". Express "nullable but in range when
    * present" explicitly as `col.isNull || col > 0`. */
  final case class Rule(name: String, predicate: Column)

  def notNull(c: String): Rule = Rule(s"${c}_not_null", col(c).isNotNull)
  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"${c}_in_set", col(c).isin(allowed: _*))
  def between(c: String, lo: Double, hi: Double): Rule =
    Rule(s"${c}_between", col(c) >= lo && col(c) <= hi)
  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_matches", col(c).rlike(regex))

  /** The single-pass annotation every other entry point builds on:
    * input columns plus `violations` (names of failed rules, rule
    * order) and `is_valid`. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // withColumn would silently REPLACE a user column of the same name,
    // and clean() would then drop it — data loss, not just a collision
    require(!df.columns.contains("violations") && !df.columns.contains("is_valid"),
      "input must not contain reserved columns violations/is_valid")
    df.withColumn("violations",
        filter(array(rules.map(r =>
          when(!coalesce(r.predicate, lit(false)), r.name)): _*),
          v => v.isNotNull))
      .withColumn("is_valid", size(col("violations")) === 0)
  }

  /** Rows passing every rule, original schema (the batch a downstream
    * stage may consume). */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    annotate(df, rules).filter(col("is_valid"))
      .drop("violations", "is_valid")

  /** Rows failing at least one rule, annotated with their violation
    * list (the batch an operator quarantines for triage). */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame =
    annotate(df, rules).filter(!col("is_valid")).drop("is_valid")

  /** Per-rule violation counts as a tall frame (rule, n_rows, n_viol)
    * in rule order — ONE aggregation job over the annotated frame
    * (map-side combined; the explode-struct pivot is the same shape as
    * [[Profile.summarize]]), not a job per rule. */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val annotated = annotate(df, rules)
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      // coalesce: an EMPTY batch must report 0 violations, not NULL —
      // this module's own doctrine is that 3VL unknowns don't pass
      coalesce(
        sum(when(array_contains(col("violations"), r.name), 1L).otherwise(0L)),
        lit(0L)).as(s"__v$i")
    }
    annotated.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
          col(s"__v$i").as("n_viol"))
      }: _*)).as("m"))
      .select(col("m.rule"), col("m.n_rows"), col("m.n_viol"))
  }

  /** Key-uniqueness violations: one row per key appearing more than
    * once, with its multiplicity. Shuffles (key, count) only —
    * [[Dedup.exact]]'s shape on the declared key. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Referential-integrity violations: distinct `fkCol` values with no
    * match in `ref.refCol` (NULL fks are skipped — compose with
    * [[notNull]] if required). Distinct-then-anti-join ships one row
    * per distinct dangling key; AQE picks broadcast when `ref`'s key
    * projection is small. */
  def danglingKeys(df: DataFrame, fkCol: String,
                   ref: DataFrame, refCol: String): DataFrame =
    df.select(col(fkCol)).filter(col(fkCol).isNotNull).distinct()
      .join(ref.select(col(refCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
}
