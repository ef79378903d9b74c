package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IncrementalAgg
import graft.catalog.TableCatalog
import org.apache.spark.sql.functions._

/** Partial-state maintenance: merge == full recompute, compaction
  * preserves content, per-batch rerun stays idempotent. */
class IncrementalAggSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def fixture = Seq(
    (1L, 10L, "b1"), (1L, 20L, "b1"), (2L, 5L, "b1"),
    (1L, 7L, "b2"), (3L, 100L, "b2"),
    (2L, 1L, "b3"))
    .toDF("k", "v", "b")

  private def mergedMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("merge of per-batch partials equals the direct aggregate") {
    val d = fixture
    val states = Seq("b1", "b2", "b3").map(b =>
      IncrementalAgg.partials(d.filter(col("b") === b), Seq("k"), col("v"))
        .withColumn("b", lit(b)))
      .reduce(_ unionByName _)
    val out = mergedMap(IncrementalAgg.merge(states, Seq("k")))
    assert(out === Map(
      1L -> ((3L, 37L, 7L, 20L)),
      2L -> ((2L, 6L, 1L, 5L)),
      3L -> ((1L, 100L, 100L, 100L))))
  }

  test("compact folds aged batches, leaves recent ones, preserves the merge") {
    val d = fixture
    val states = Seq("b1", "b2", "b3").map(b =>
      IncrementalAgg.partials(d.filter(col("b") === b), Seq("k"), col("v"))
        .withColumn("b", lit(b)))
      .reduce(_ unionByName _)
    val compacted = IncrementalAgg.compact(states, Seq("k"), "b", cutoff = "b2")
    // aged partials collapse to one state per key labeled at the cutoff
    val batches = compacted.select(col("b")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(batches === Set("b2", "b3"))
    assert(mergedMap(IncrementalAgg.merge(compacted, Seq("k"))) ===
      mergedMap(IncrementalAgg.merge(states, Seq("k"))))
  }

  test("re-appending a batch's state overwrites its partition (idempotent rerun)") {
    val root = java.nio.file.Files.createTempDirectory("iagg").toString
    val cat = new TableCatalog(spark, root)
    val d = fixture
    def appendBatch(b: String): Unit =
      cat.appendPartitioned("st",
        IncrementalAgg.partials(d.filter(col("b") === b), Seq("k"), col("v"))
          .withColumn("b", lit(b)), "b")
    appendBatch("b1"); appendBatch("b2")
    appendBatch("b2") // rerun must not double-count
    val out = mergedMap(IncrementalAgg.merge(cat.read("st"), Seq("k")))
    assert(out === Map(
      1L -> ((3L, 37L, 7L, 20L)),
      2L -> ((1L, 5L, 5L, 5L)),
      3L -> ((1L, 100L, 100L, 100L))))
  }
}
