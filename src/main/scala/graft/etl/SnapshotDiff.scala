package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive for sources
  * that only hand over full extracts (exactly the reference's situation:
  * its terminals/clients arrive as whole files per date with no change
  * feed, main.py:183-214, and SCD2 re-derives history from full
  * snapshots). `diff` turns two snapshots into an explicit changeset
  * (insert / update / delete per key, with the changed columns named) —
  * the form a downstream incremental consumer or audit wants, and the
  * input [[Scd2.merge]] semantics are defined over.
  *
  * ONE null-safe full-outer join on the key; change classification and
  * per-column comparison are codegen'd expressions on the joined row, so
  * the whole operator is a single shuffle partitioned by the key at any
  * scale. Unchanged keys — the overwhelming majority of a daily
  * snapshot — are filtered out AFTER the join but BEFORE any further
  * exchange, so downstream stages see only the delta.
  */
object SnapshotDiff {

  /** Changeset from `oldSnap` to `newSnap`, keyed by `keys`, comparing
    * `compareCols` (null-safe: NULL vs NULL is unchanged, NULL vs value
    * is a change). Output: key columns, `change_type` ∈
    * {insert, update, delete}, and `changed_cols` — for updates the
    * comma-joined names of differing columns in `compareCols` order;
    * empty for inserts/deletes (every column is trivially "changed").
    * Keys must be unique per snapshot (a snapshot IS a keyed state). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val pick = (keys ++ compareCols).map(col)
    val o = oldSnap.select(pick: _*).withColumn("_in_old", lit(true)).alias("o")
    val n = newSnap.select(pick: _*).withColumn("_in_new", lit(true)).alias("n")
    // presence flags, not key-null checks: a legitimately-NULL key column
    // must not masquerade as an absent row
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val changed: Seq[Column] =
      compareCols.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
    val anyChanged = changed.reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(col("o._in_old").isNull, "insert")
          .when(col("n._in_new").isNull, "delete")
          .otherwise("update"))
      .filter(col("change_type") =!= "update" || anyChanged)
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++ Seq(
          col("change_type"),
          when(col("change_type") === "update",
            concat_ws(",", compareCols.zip(changed).map { case (c, ch) =>
              when(ch, lit(c))
            }: _*))
            .otherwise(lit("")).as("changed_cols")): _*)
  }
}
