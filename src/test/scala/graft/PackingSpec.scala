package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Packing

/** The distributed prefix sum behind sequence packing: partition count
  * must cancel out of the offsets, windows must tile the tape exactly,
  * and zero-token docs must occupy nothing. */
class PackingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = (1 to 200)
    .map(i => (i.toLong, (i * 7 % 13).toLong)) // token counts 0..12, incl. 0s
    .toDF("doc_id", "n_tokens")

  private def pack(parts: Int) =
    Packing.packSequences(docs, "doc_id", "n_tokens",
        capacity = 32L, numPartitions = parts)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("offsets are independent of the partition count (prefix-sum correctness)") {
    val one = pack(1)
    assert(one === pack(7))
    assert(one === pack(64)) // more partitions than natural splits
  }

  test("offsets tile the tape: each doc starts where the previous ended") {
    var expected = 0L
    pack(7).foreach { case (id, n, off, _, _) =>
      assert(off === expected, s"doc $id")
      expected += n
    }
  }

  test("bin spans are exact and zero-token docs occupy nothing") {
    pack(7).foreach { case (id, n, off, sb, eb) =>
      if (n == 0) assert(sb === eb)
      else {
        assert(sb === off / 32)
        assert(eb === (off + n - 1) / 32)
      }
      assert(eb >= sb && eb <= sb + 1) // counts <= capacity span <= 2 bins
    }
  }
}
