package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group WITHOUT sorting whole groups — the aggregation
  * answer to the reference's `row_number()`-then-filter pattern
  * (main.py:459-471, re-expressed as W1/W2). The window form shuffles
  * EVERY row of every group and sorts each group fully just to discard
  * all but k rows; at 100 TB a hot group (one card with millions of
  * transactions) is a single sort partition. This operator aggregates
  * instead: a bounded k-entry buffer per group, updated map-side, so
  * the exchange ships at most k entries per (group, map partition) and
  * no sort of full groups ever happens — group size drops out of the
  * cost entirely.
  *
  * The buffer is a typed [[Aggregator]] (ObjectHashAggregate at the
  * physical layer: buffers live as JVM objects, serialized only at the
  * partial→final boundary). That trades whole-stage codegen for the
  * bounded shuffle — the right trade exactly when groups are large;
  * for tiny-group data the window form's simplicity wins
  * (TopKSpec and the x_topk_group oracle pin the two forms equal). */
object TopK {

  /** One candidate row: ordering value + the row's id payload. */
  final case class Entry(v: Double, id: Long)
  /** Aggregation buffer/result wrapper (product type so the buffer
    * round-trips through the public [[Encoders.product]]). `entries`
    * stays sorted by (v desc, id asc) and never exceeds k. */
  final case class Buf(entries: List[Entry])

  private val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.v, e.id))

  /** Typed top-k aggregator: reduce inserts one entry, merge zips two
    * sorted lists — both O(k) per call with a ≤k buffer. Ties on the
    * value break by ascending id (deterministic, engine-portable). */
  final class TopKAggregator(k: Int) extends Aggregator[Entry, Buf, Buf] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Entry): Buf =
      // skip the O(k) insert when the buffer is full and a is beaten by
      // the current minimum — the overwhelmingly common case map-side
      if (b.entries.sizeIs >= k && ord.lteq(b.entries.last, a)) b
      else Buf((a :: b.entries).sorted(ord).take(k))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf((b1.entries ++ b2.entries).sorted(ord).take(k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Top `k` rows per group by `valueCol` descending (ties by `idCol`
    * ascending): (groupCols..., rank, id, v). Null ordering values are
    * excluded — a row that can't rank doesn't compete. `idCol` must be
    * integral (it rides the buffer as a Long): a string id would cast
    * to NULL and kill the aggregator mid-job with an opaque
    * null-in-non-nullable error, and a fractional id would silently
    * truncate the tie-break — hash string ids to longs first
    * (`xxhash64`) and join back. */
  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
               idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val idType = df.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idType),
      s"idCol $idCol must be an integral type, got $idType — hash string ids " +
        "to longs (xxhash64) and join back")
    val agg = udaf(new TopKAggregator(k))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double"), col(idCol).cast("long")).as("topk"))
      .select(groupCols.map(col) :+
        posexplode(col("topk.entries")).as(Seq("pos", "e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("id"), col("e.v").as("v")): _*)
  }
}
