package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

/** Deletion-neighborhood fuzzy join vs the naive all-pairs join: the
  * blocking must be lossless at the declared distance (FastSS
  * completeness), and the hot-key cap must degrade loudly-but-boundedly,
  * not crash. */
class FuzzyJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // substitution / insertion / deletion / distance-2 / far-apart cases,
  // plus empty and single-char edge strings
  private val leftWords = Seq(
    "anvil", "anvyl", "nvil", "anvils", "widget", "widgett", "wadget",
    "bolt", "colt", "b", "", "ring", "rings", "rim", "plate")
  private val rightWords = Seq(
    "anvil", "anvik", "avil", "widget", "widge", "wedgat", "gadget",
    "bolt", "bolts", "c", "", "ring", "rin", "ram", "slate", "plate")

  private def leftDf = leftWords.zipWithIndex
    .map { case (w, i) => (i.toLong, w) }.toDF("lid", "lstr")
  private def rightDf = rightWords.zipWithIndex
    .map { case (w, i) => (i.toLong, w) }.toDF("rid", "rstr")

  private def brute(k: Int): Set[(Long, Long, Long)] =
    leftDf.filter(length($"lstr") > 0)
      .crossJoin(rightDf.filter(length($"rstr") > 0))
      .withColumn("dist", levenshtein($"lstr", $"rstr").cast("long"))
      .filter($"dist" <= k)
      .select("lid", "rid", "dist").as[(Long, Long, Long)]
      .collect().toSet

  private def fuzzy(k: Int, cap: Long = 10000): Set[(Long, Long, Long)] =
    FuzzyJoin.join(leftDf, "lid", "lstr", rightDf, "rid", "rstr",
        maxDist = k, maxKeyFreq = cap)
      .select("lid", "rid", "dist").as[(Long, Long, Long)]
      .collect().toSet

  test("k=1 blocking is lossless vs the naive all-pairs join") {
    val b = brute(1)
    assert(b.nonEmpty, "fixture must contain distance<=1 pairs")
    assert(fuzzy(1) === b)
  }

  test("k=2 blocking is lossless vs the naive all-pairs join") {
    val b = brute(2)
    assert(b.exists(_._3 == 2), "fixture must contain distance-2 pairs")
    assert(fuzzy(2) === b)
  }

  test("deletion neighborhood of short strings") {
    val got = Seq("ab", "x", "").toDF("s")
      .select($"s", FuzzyJoin.deletions1($"s").as("d"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("ab").toSet === Set("ab", "a", "b"))
    assert(got("x").toSet === Set("x", ""))
    assert(got("").toSet === Set(""))
  }

  test("maxDist outside {1,2} is rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(leftDf, "lid", "lstr", rightDf, "rid", "rstr", maxDist = 3)
    }
  }

  test("colliding column names are rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(leftDf, "lid", "lstr",
        rightDf.withColumnRenamed("rstr", "lstr"), "rid", "lstr", maxDist = 1)
    }
  }

  test("hot-key cap bounds a degenerate identical cluster") {
    // 500 identical strings on each side: every deletion key is shared by
    // all of them -> 250k candidate pairs in one bucket without the cap.
    val l = (0L until 500L).map(i => (i, "duplicate")).toDF("lid", "lstr")
    val r = (0L until 500L).map(i => (i, "duplicate")).toDF("rid", "rstr")
    val capped = FuzzyJoin.join(l, "lid", "lstr", r, "rid", "rstr",
      maxDist = 1, maxKeyFreq = 100)
    assert(capped.count() === 0L) // dropped, not exploded
    val uncapped = FuzzyJoin.join(l.limit(20), "lid", "lstr",
      r.limit(20), "rid", "rstr", maxDist = 1)
    assert(uncapped.count() === 400L)
  }

  // -------------------------------------------- Fellegi-Sunter linkage

  private val fsFields = Seq(("name", 24L, -8L), ("phone", 30L, -10L))

  test("linkage: agreement weights sum, thresholds classify, NULLs are neutral") {
    val a = Seq((1L, 10L, "alice", "555-01"), (2L, 10L, "bob", "555-02"),
      (3L, 20L, "carol", null)).toDF("id", "blk", "name", "phone")
    val b = Seq((11L, 10L, "alice", "555-01"),  // full agree: 54 -> match
      (12L, 10L, "bob", "555-99"),              // name only: 24-10=14 -> possible
      (13L, 20L, "carol", "555-03")             // null phone: 24+0 -> possible
    ).toDF("id", "blk", "name", "phone")
    val out = FuzzyJoin.linkage(a, "id", b, "id", Seq("blk"), fsFields,
        upper = 40L, lower = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out((1L, 11L)) === ((54L, "match")))
    assert(out((2L, 12L)) === ((14L, "possible")))
    assert(out((3L, 13L)) === ((24L, "possible")))
    // cross pair in block 10: both fields disagree -> -18 non_match
    assert(out((1L, 12L)) === ((-18L, "non_match")))
    assert(!out.contains((1L, 13L)), "different blocks never pair")
  }

  test("linkage: oversized blocks are dropped before pair generation") {
    val big = (1L to 50L).map(i => (i, 1L, s"n$i", s"p$i"))
    val small = Seq((100L, 2L, "x", "y"))
    val a = (big ++ small).toDF("id", "blk", "name", "phone")
    val out = FuzzyJoin.linkage(a, "id", a, "id", Seq("blk"), fsFields,
      upper = 40L, lower = 0L, maxBlockRows = 10L)
    // block 1 (50 rows -> 2500 pairs) dropped; block 2 survives
    assert(out.select("id_a").as[Long].collect().toSeq === Seq(100L))
  }
}
