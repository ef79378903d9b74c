package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import org.apache.spark.sql.functions.col

/** Property-level guarantees of the dedup candidate generation: the
  * SimHash chunking math (Spark-less scalacheck, same pattern as
  * Scd2PropertySpec) and the LSH bucket-cap behavior on a degenerate
  * identical cluster (VERDICT r2 #4). */
class DedupPropertySpec extends AnyFunSuite with SparkTestSession {

  private def chunkKeys(fp: Long, bounds: Seq[(Int, Int)]): Seq[Long] =
    bounds.map { case (lo, hi) =>
      val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1
      (fp >>> lo) & mask
    }

  private val pairGen = for {
    k <- Gen.choose(0, 16)
    fp <- Gen.long
    nFlips <- Gen.choose(0, k)
    flips <- Gen.pick(nFlips, 0 until 64)
  } yield (k, fp, flips.toSet)

  test("pigeonhole recall: any pair within hamming k shares a chunk key under chunkBounds(k)") {
    (1 to 500).foreach { i =>
      val (k, fp, flips) = pairGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed at $i"))
      val other = flips.foldLeft(fp)((v, b) => v ^ (1L << b))
      val bounds = Dedup.chunkBounds(k)
      val shared = chunkKeys(fp, bounds).zip(chunkKeys(other, bounds))
        .exists { case (a, b) => a == b }
      assert(shared,
        s"k=$k flips=$flips: no shared chunk — candidate pair would be LOST")
    }
  }

  test("beyond the threshold the guarantee (correctly) does not hold: a k+1-spread pair can miss every chunk") {
    // one flipped bit per chunk of chunkBounds(k) → hamming k+1, all keys differ
    val k = 3
    val bounds = Dedup.chunkBounds(k)
    val other = bounds.foldLeft(0L)((v, b) => v ^ (1L << b._1))
    val shared = chunkKeys(0L, bounds).zip(chunkKeys(other, bounds))
      .exists { case (a, b) => a == b }
    assert(!shared)
  }

  test("minhashLsh cap: a 1000-doc identical cluster sits out (flagged), true pairs elsewhere kept") {
    import spark.implicits._
    // identical docs collide in EVERY band → one 1000-doc bucket per band
    // → 499 500 candidate pairs ×8 on single reducers without the cap
    val cluster = (1L to 1000L).map(i =>
      (i, "the same scraped boilerplate paragraph repeated verbatim across the whole corpus"))
    val genuine = Seq(
      (2001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
    val docs = (cluster ++ genuine).toDF("doc_id", "text")

    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", maxBucketSize = 100)
      .collect()
    assert(!pairs.exists(_.getLong(0) <= 1000L),
      "over-cap cluster buckets must not generate pairs")
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2001L, 2002L)),
      "the genuine near-dup pair outside the cluster must survive the cap")

    val dropped = Dedup.droppedLshBuckets(docs, "doc_id", "text", maxBucketSize = 100)
      .collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) === 1000L),
      "the audit must report exactly the cluster-sized buckets")

    // the recommended treatment: exact-collapse first, then LSH — the
    // cluster becomes ONE representative and no bucket exceeds the cap
    val collapsed = Dedup.exact(docs, "doc_id", "text")
      .join(docs, col("keep_id") === col("doc_id"))
      .select("doc_id", "text")
    assert(Dedup.droppedLshBuckets(collapsed, "doc_id", "text",
      maxBucketSize = 100).isEmpty)
  }

  test("embeddingNearDup cap: an identical-vector cluster sits out, a distinct close pair survives") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i + 1.0))
    val other = Array.tabulate(64)(i => math.cos(2.0 * i + 0.5))
    val cluster = (1L to 50L).map(i => (i, base.toSeq))
    val pair = Seq((101L, other.toSeq), (102L, other.map(_ * 1.1).toSeq))
    val embs = (cluster ++ pair).toDF("vid0", "v")
    val out = Dedup.embeddingNearDup(embs, "vid0", "v", minCos = 0.95,
      maxBucketSize = 10).collect()
    assert(!out.exists(_.getLong(0) <= 50L))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((101L, 102L)))
  }
}
