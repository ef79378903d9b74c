package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IntervalJoin
import scala.util.Random

/** Bucketed interval join ≡ naive equi-join + range filter, on randomized
  * data with boundary-heavy timestamps (multiples of the window width,
  * sub-second offsets, duplicates). */
class IntervalJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("equivalence with the naive range join on seeded random data") {
    val rnd = new Random(7)
    val base = 1700000000L
    val rows = (1 to 400).map { i =>
      val key = rnd.nextInt(5).toLong
      // cluster timestamps so windows genuinely overlap; hit exact bucket
      // boundaries often (multiples of 1200)
      val ts = base + rnd.nextInt(40) * 600L + (if (rnd.nextBoolean()) 0L else rnd.nextInt(1000))
      (i.toLong, key, new java.sql.Timestamp(ts * 1000 + rnd.nextInt(3) * 500))
    }
    val df = rows.toDF("id", "key", "ts")
    val left = df.select($"id".as("lid"), $"key", $"ts")
    val right = df.select($"id".as("rid"), $"key", $"ts".as("ts2"))

    val bucketed = IntervalJoin.joinWithin(left, right, "key", "ts", "ts2", 1200L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("key"))
      .filter($"ts2".between($"ts", $"ts" + expr("INTERVAL 1200 SECONDS")))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed === naive)
    assert(naive.nonEmpty)
    // every row self-matches (ts BETWEEN ts AND ts+W)
    assert(rows.map(r => (r._1, r._1)).toSet.subsetOf(bucketed))
  }
}
