package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Hilbert

/** The property that makes Hilbert worth having next to Morton:
  * consecutive curve positions are GRID NEIGHBORS — plus bijectivity
  * and golden first-quadrant values. */
class HilbertSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("bits=1 golden: the elementary U (0,0)→(1,0)... order") {
    // xy2d at n=2: (0,0)=0, (0,1)=1, (1,1)=2, (1,0)=3
    val got = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val h = Hilbert.withHilbert(got, "x", "y", bits = 1)
      .select("x", "y", "h").as[(Long, Long, Long)].collect().toMap2
    assert(h === Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("bijective over the full 32x32 grid") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val hs = Hilbert.withHilbert(grid, "x", "y", bits = 5)
      .select("h").as[Long].collect()
    assert(hs.length === 1024 && hs.toSet === (0L until 1024L).toSet)
  }

  test("consecutive curve positions are manhattan neighbors (Morton is not)") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val walk = Hilbert.withHilbert(grid, "x", "y", bits = 5)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    walk.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // the same walk along the MORTON curve jumps (e.g. z=1 (1,0) →
    // z=2 (0,1) is distance 2) — the locality Hilbert buys
    val morton = grid.select(col("x"), col("y"),
      graft.ops.ZOrder.zValue(col("x"), col("y"), 5).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val mJumps = morton.sliding(2).count { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(mJumps > 0)
  }

  test("clustered write: per-file envelopes at least as tight as z-order") {
    val grid = (0 until 4096)
      .map(i => ((i % 64).toLong, (i / 64).toLong)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    Hilbert.cluster(grid, "x", "y", bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096L)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), count(lit(1)).as("nf"))
      .head()
    assert(spans.getLong(2) >= 8)
    // same bound ZOrderSpec holds Morton to; Hilbert must not be worse
    assert(spans.getDouble(0) < 32.0 && spans.getDouble(1) < 32.0)
  }

  test("n=3: bijective over the full 8x8x8 cube and every consecutive " +
      "curve step is a grid neighbor (Skilling walk)") {
    val cube = (for { x <- 0 until 8; y <- 0 until 8; z <- 0 until 8 }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val walk = Hilbert.withHilbertN(cube, Seq("x", "y", "z"), bits = 3)
      .select("h", "x", "y", "z").as[(Long, Long, Long, Long)].collect()
    // bijection onto [0, 8^3)
    assert(walk.map(_._1).toSet === (0L until 512L).toSet)
    // the Hilbert property in 3-D: manhattan distance 1 between every
    // pair of consecutive positions — all 511 steps, no power-of-two
    // seam jumps (the z-order comparison in the 2-D test above)
    walk.sortBy(_._1).sliding(2).foreach {
      case Array((_, x1, y1, z1), (h2, x2, y2, z2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1L,
          s"jump into h=$h2: ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
      case _ => ()
    }
  }

  test("n=4 bijection at bits=2; withHN scales real columns; clusterN " +
      "envelopes are compact") {
    val grid4 = (for { a <- 0 until 4; b <- 0 until 4; c <- 0 until 4; d <- 0 until 4 }
      yield (a.toLong, b.toLong, c.toLong, d.toLong)).toDF("a", "b", "c", "d")
    val hs = Hilbert.withHilbertN(grid4, Seq("a", "b", "c", "d"), bits = 2)
      .select("h").as[Long].collect()
    assert(hs.toSet === (0L until 256L).toSet)
    // withHN: quantization bounds from data, index attached
    val pts = (0 until 1000)
      .map(i => (i.toLong * 7 % 101, i.toLong * 13 % 97, i.toLong * 3 % 89))
      .toDF("u", "v", "w")
    val withH = Hilbert.withHN(pts, Seq("u", "v", "w"), bits = 5)
    assert(withH.columns.contains("h") && withH.count() === 1000L)
    // clusterN: files cover compact 3-D boxes
    val cube = (for { x <- 0 until 16; y <- 0 until 16; z <- 0 until 16 }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val dir = java.nio.file.Files.createTempDirectory("hilbert3").toString
    Hilbert.clusterN(cube, Seq("x", "y", "z"), bits = 4, numPartitions = 8)
      .write.mode("overwrite").parquet(dir)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
        (max($"z") - min($"z")).as("sz"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), avg($"sz").as("az"))
      .head()
    // 4096 cells over >=8 files: a random layout would average near the
    // full 15-span on every axis; Hilbert boxes stay well under
    assert(spans.getDouble(0) < 12.0 && spans.getDouble(1) < 12.0 &&
      spans.getDouble(2) < 12.0)
  }

  private implicit class Tuple3Ops(a: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] = a.map(t => (t._1, t._2) -> t._3).toMap
  }
}
