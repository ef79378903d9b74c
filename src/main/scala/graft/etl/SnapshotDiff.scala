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

  /** Value-carrying changeset: like [[diff]] but each insert/update row
    * also carries the NEW values of `compareCols` (null for deletes) —
    * the form [[applyChanges]] can replay. Same single full-outer
    * shuffle; only the delta leaves the operator. */
  def changes(oldSnap: DataFrame, newSnap: DataFrame,
              keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changes needs at least one key column")
    val pick = (keys ++ compareCols).map(col)
    val o = oldSnap.select(pick: _*).withColumn("_in_old", lit(true)).alias("o")
    val n = newSnap.select(pick: _*).withColumn("_in_new", lit(true)).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val anyChanged = compareCols.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(col("o._in_old").isNull, "insert")
          .when(col("n._in_new").isNull, "delete")
          .otherwise("update"))
      .filter(col("change_type") =!= "update" || anyChanged)
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
          Seq(col("change_type")) ++
          compareCols.map(c => col(s"n.$c").as(c)): _*)
  }

  /** Replay a [[changes]] changeset onto the old snapshot, exactly
    * reconstructing the new one: deletes and updates retire the old
    * row (one anti-join shipping keys+type only), inserts and updates
    * contribute their new values. The round trip
    * `applyChanges(old, changes(old, new)) == new` is the operator's
    * contract — pinned by the oracle gate — and makes full-extract
    * sources consumable incrementally: ship the changeset, not the
    * snapshot. */
  def applyChanges(oldSnap: DataFrame, changeset: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val cols = (keys ++ compareCols).map(col)
    val retired = changeset
      .filter(col("change_type").isin("delete", "update"))
      .select(keys.map(col): _*).alias("r")
    // null-safe anti join: diff/changes treat NULL keys as real keys
    // (<=>), so the replay must retire them the same way
    val antiCond = keys.map(k => col(s"s.$k") <=> col(s"r.$k")).reduce(_ && _)
    val surviving = oldSnap.select(cols: _*).alias("s")
      .join(retired, antiCond, "left_anti")
    val incoming = changeset
      .filter(col("change_type").isin("insert", "update"))
      .select(cols: _*)
    surviving.unionByName(incoming)
  }
}
