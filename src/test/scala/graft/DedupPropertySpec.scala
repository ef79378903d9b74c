package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Property-level guarantees of the SimHash candidate generation — the
  * pure math the distributed join relies on. No Spark session needed:
  * the recall guarantee IS the chunking scheme, so it's checked directly
  * over random fingerprints and bit-flip sets (raw scalacheck Gen, same
  * pattern as Scd2PropertySpec). */
class DedupPropertySpec extends AnyFunSuite {

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
}
