package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** C1 — generic SCD2 merge (SURVEY.md §2.8), the pattern the reference
  * instantiates four times (clients main.py:121-198, accounts 201-257,
  * cards 260-314, terminals 317-379).
  *
  * Reference semantics, preserved exactly:
  *   - "current" row = `effective_to = '3000-01-01'` (main.py:159, 179);
  *   - close a current row when a staging row with the same key differs on
  *     ANY attribute under null-rejecting `<>` (main.py:151-158 — a NULL
  *     attribute never counts as changed, SURVEY §2.9.8): set
  *     `effective_to = date, deleted_flg = TRUE` (main.py:142-143);
  *   - insert a new `[date, 3000-01-01, false)` version for new keys and
  *     changed rows (main.py:162-191);
  *   - keys missing from staging are never closed (no deletion detection);
  *   - an empty dim degenerates to the initial full load (main.py:125-140)
  *     without needing the reference's driver-side IF-EXISTS branch.
  *
  * Shape: ONE full-outer join of current rows vs staging on the key, then a
  * conditional array + explode emits 0-2 output rows per joined row — a
  * single shuffle where the reference runs an UPDATE (semi-join) plus an
  * INSERT (left join). Already-closed history is unioned back untouched
  * (scan only, no shuffle). At 100 TB the join key partitioning carries
  * through; only the current slice (small) joins staging.
  */
object Scd2 {

  /** Per-dim merge spec: join key + the change-tracked attribute list. */
  final case class DimSpec(key: String, attrs: Seq[String]) {
    def allCols: Seq[String] = key +: attrs
  }

  val clients    = DimSpec("client_id",
    Seq("last_name", "first_name", "patrinymic", "date_of_birth",
        "passport_num", "passport_valid_to", "phone"))  // main.py:144
  val accounts   = DimSpec("account_num", Seq("valid_to", "client"))      // main.py:219
  val cards      = DimSpec("card_num", Seq("account_num"))                // main.py:277
  val terminals  = DimSpec("terminal_id",
    Seq("terminal_type", "terminal_city", "terminal_address"))            // main.py:336

  private val openEnd: Column = lit(Schemas.OpenEndDate)
  private val scd2Cols = Seq("effective_from", "effective_to", "deleted_flg")

  /** Merge `staging` (this date's snapshot, staging schema = key+attrs)
    * into `dim` (full history, key+attrs+scd2 cols) for `date`.
    * Returns the complete new dim content (caller swaps it in via
    * TableCatalog.replaceAtomic). */
  def merge(dim: DataFrame, staging: DataFrame, spec: DimSpec,
            date: java.sql.Date): DataFrame = {
    val outCols = spec.allCols ++ scd2Cols
    val closedHistory = dim.filter(col("effective_to") =!= openEnd)
    // single-result form: all three branches explode out of ONE
    // full-outer join pass (returning newOpen/closedNow separately, as
    // mergeOpen does for the Runner's split storage, would execute the
    // join once per union arm)
    val m = mergeParts(dim.filter(col("effective_to") === openEnd),
      staging, spec, date)
    closedHistory.select(outCols.map(col): _*)
      .unionByName(m.emit(m.keepOpen, m.insertNew, m.closeNow))
  }

  /** Point-in-time (as-of) read of an SCD2 history: the version of each
    * key valid at `date`. `effective_from` is inclusive, `effective_to`
    * exclusive — a close and its successor share the boundary date
    * (main.py:142-143 sets effective_to = date while the new version
    * starts at date), and the successor wins on that day. On the
    * open/closed storage split (TableCatalog.readScd2) the closed side
    * prunes to partitions with effective_to > date. */
  def asOf(history: DataFrame, date: java.sql.Date): DataFrame =
    history.filter(col("effective_from") <= lit(date) &&
      lit(date) < col("effective_to"))

  /** The incremental core: merge `staging` against only the CURRENT (open)
    * slice of the dim, returning (new open set, rows closed by this
    * batch). At scale this is what keeps the SCD2 maintenance cost
    * O(|current| + |staging|) per batch — closed history is never read or
    * rewritten; newly closed rows append to a separate effective_to-
    * partitioned table (see Runner) so a rerun of the same date
    * dynamic-overwrites its own partition instead of duplicating. */
  def mergeOpen(open: DataFrame, staging: DataFrame, spec: DimSpec,
                date: java.sql.Date): (DataFrame, DataFrame) = {
    val m = mergeParts(open, staging, spec, date)
    (m.emit(m.keepOpen, m.insertNew), m.emit(m.closeNow))
  }

  /** The joined merge frame plus the three conditional output branches;
    * `emit` explodes any subset out of the SAME join. */
  private final case class MergeParts(j: DataFrame, outCols: Seq[String],
      keepOpen: Column, closeNow: Column, insertNew: Column) {
    def emit(branches: Column*): DataFrame = j
      .select(explode(filter(array(branches: _*), _.isNotNull)).as("_r"))
      .select(outCols.map(c => col(s"_r.$c")): _*)
  }

  private def mergeParts(open: DataFrame, staging: DataFrame, spec: DimSpec,
                         date: java.sql.Date): MergeParts = {
    val d = open
      .select(col(spec.key).as("_k") +:
        (spec.attrs.map(a => col(a).as(s"_d_$a")) :+
         col("effective_from").as("_d_from")): _*)
    val s = staging
      .select(col(spec.key).as("_k") +: spec.attrs.map(a => col(a).as(s"_s_$a")): _*)
      .withColumn("_s_present", lit(true))
    val j = d.withColumn("_d_present", lit(true)).join(s, Seq("_k"), "full_outer")

    val dPresent = col("_d_present").isNotNull
    val sPresent = col("_s_present").isNotNull
    // Null-rejecting OR-chain, exactly the reference's `<>` list
    // (main.py:151-158): NULL on either side → not changed. The coalesce
    // pins SQL three-valued logic to the reference behavior — a NULL
    // verdict means "not changed" in both the UPDATE's IN-subquery and
    // the INSERT's WHERE, so the row must land in keepOpen, not vanish.
    val changed: Column = coalesce(spec.attrs
      .map(a => col(s"_d_$a") =!= col(s"_s_$a"))
      .reduceOption(_ || _).getOrElse(lit(false)), lit(false))

    def mkStruct(key: Column, attrs: Seq[Column], from: Column,
                 to: Column, del: Column): Column =
      struct((key.as(spec.key) +: attrs.zip(spec.attrs).map { case (c, a) => c.as(a) }) ++
        Seq(from.as("effective_from"), to.as("effective_to"), del.as("deleted_flg")): _*)

    val dAttrs = spec.attrs.map(a => col(s"_d_$a"))
    val sAttrs = spec.attrs.map(a => col(s"_s_$a"))

    MergeParts(j, spec.allCols ++ scd2Cols,
      keepOpen = when(dPresent && !(sPresent && changed),
        mkStruct(col("_k"), dAttrs, col("_d_from"), openEnd, lit(false))),
      closeNow = when(dPresent && sPresent && changed,
        mkStruct(col("_k"), dAttrs, col("_d_from"), lit(date), lit(true))),
      insertNew = when(sPresent && (!dPresent || changed),
        mkStruct(col("_k"), sAttrs, lit(date), openEnd, lit(false))))
  }
}
