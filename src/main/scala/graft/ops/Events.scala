package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an (entity, type, timestamp) stream —
  * the product-analytics queries (conversion funnels, cohort retention)
  * that sit beside [[Sessionize]] on the events surface.
  *
  * Both operators aggregate to compact per-entity facts before any
  * join, so shuffles carry (entity, timestamp) pairs — never raw event
  * payloads — and no operator buffers an entity's history (the funnel
  * is L chained filtered aggregates, not a collect-and-sort; retention
  * is two aggregates).
  */
object Events {

  /** Ordered conversion funnel: for each entity, the FIRST time of
    * stage 1, then the first stage-2 event STRICTLY AFTER it, then the
    * first stage-3 after that, ... (the standard strict-sequence
    * semantics: re-orderings don't count, repeats before the previous
    * stage don't count). Output: one row per entity that completed
    * stage 1, with nullable `<stage>_ts` columns and `stages_done`.
    *
    * Stage i is one filtered min-aggregate on the entity key joined to
    * the stage-(i−1) result — L−1 equi-joins on the same key, each
    * side already one row per entity. A hot entity contributes its
    * event count to ONE aggregate's combine, never to a buffered
    * list. */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct event types")
    def stageMin(stage: String, after: Option[DataFrame], prevCol: String): DataFrame = {
      val base = events.select(col(entityCol).as("_e"),
        col(typeCol).as("_t"), col(tsCol).as("_ts"))
        .filter(col("_t") === stage)
      val scoped = after match {
        case None => base
        case Some(prev) =>
          base.join(prev.select(col("_e"), col(prevCol).as("_prev")), Seq("_e"))
            .filter(col("_ts") > col("_prev"))
      }
      scoped.groupBy(col("_e")).agg(min(col("_ts")).as(s"${stage}_ts"))
    }
    val first = stageMin(stages.head, None, "")
    val chained = stages.tail.foldLeft((first, s"${stages.head}_ts", first)) {
      case ((acc, prevCol, prevStage), stage) =>
        val s = stageMin(stage, Some(prevStage), prevCol)
        // left join: entities stall at the furthest stage reached
        (acc.join(s, Seq("_e"), "left"), s"${stage}_ts", s)
    }._1
    chained
      .withColumn("stages_done",
        stages.map(s => when(col(s"${s}_ts").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .withColumnRenamed("_e", entityCol)
  }

  /** First-order Markov transition matrix over an entity's event-type
    * sequence: for every consecutive pair (src → dst) within an entity,
    * the transition count and its row-normalized probability as e6
    * fixed point (`floor(n·10⁶ / row_total)` — a pure IEEE divide, so
    * the value is engine-portable).
    *
    * Ordering is pinned to whole epoch SECONDS plus the tie column
    * (the [[Sessionize]] convention): sub-second precision differs
    * between parquet readers (nanos vs micros), so ordering on the raw
    * timestamp would be engine-dependent on close events. One window
    * shuffle on the entity produces the lag pairs; the count and the
    * row total ride one groupBy + one small window over the (src, dst)
    * matrix — at most |types|² rows, trivially broadcastable
    * downstream. */
  def transitions(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(unix_timestamp(col(tsCol)), col(tieCol))
    val pairs = events
      .select(col(entityCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("_dst", lead(col(typeCol), 1).over(w))
      .filter(col("_dst").isNotNull)
    val counts = pairs
      .groupBy(col(typeCol).as("src"), col("_dst").as("dst"))
      .agg(count(lit(1)).as("n"))
    val rowW = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    counts
      .withColumn("row_total", sum(col("n")).over(rowW))
      .withColumn("p_e6",
        floor(col("n") * lit(1000000.0d) / col("row_total")).cast("long"))
  }

  /** Cohort retention: entities cohort by the DATE of their first
    * event; each (cohort_date, day_offset) cell counts the distinct
    * entities of that cohort active that day. Two aggregates — first
    * dates per entity (entity-keyed), then the cell counts over the
    * (entity, date)-distinct activity joined to its cohort — plus one
    * broadcast-friendly join on the entity key. */
  def cohortRetention(events: DataFrame, entityCol: String,
                      tsCol: String): DataFrame = {
    val activity = events
      .select(col(entityCol).as("_e"), to_date(col(tsCol)).as("_d"))
      .distinct()
    val cohorts = activity.groupBy(col("_e")).agg(min(col("_d")).as("cohort_date"))
    activity.join(cohorts, Seq("_e"))
      .groupBy(col("cohort_date"),
        datediff(col("_d"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col("_e")).as("n_active"))
  }
}
