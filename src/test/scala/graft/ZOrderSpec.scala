package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZOrder
import java.nio.file.Files

/** The Morton curve itself (golden values + integral scaling), and the
  * property that pays for it: a z-clustered write gives every output
  * file a tight min/max envelope on BOTH dimensions — the precondition
  * for parquet row-group skipping under 2-D range predicates. */
class ZOrderSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("zValue interleaves bits (golden values)") {
    val got = Seq((3L, 1L), (0L, 3L), (5L, 0L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 16).as("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(7L, 10L, 17L, 4294967295L))
  }

  test("scale quantizes by integral bucket width, overflow-free") {
    // narrow domain: bucket width 1 -> offset identity
    val got = Seq(10L, 15L, 20L).toDF("v")
      .select(ZOrder.scale($"v", lit(10L), lit(20L), 16).as("s"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 5L, 10L))
    val const = Seq(7L).toDF("v")
      .select(ZOrder.scale($"v", lit(7L), lit(7L), 16).as("s"))
      .as[Long].head()
    assert(const === 0L)
    // a 2^62 span would overflow a multiply-then-divide min-max scale
    // under ANSI; division-first stays exact and lands in [0, 2^16)
    val wide = Seq(0L, 1L << 62).toDF("v")
      .select(ZOrder.scale($"v", lit(0L), lit(1L << 62), 16).as("s"))
      .as[Long].collect().toSeq
    assert(wide === Seq(0L, 65535L))
  }

  test("zValueN: 3-D interleave golden values; 2-D form is the n=2 case") {
    // n=3, bits=2: bit i of dim j lands at 3i+j.
    // (1,1,1) -> 0b000111 = 7; (3,0,0) -> 1 + 8 = 9; (0,3,3) -> 2+4+16+32 = 54
    val got = Seq((1L, 1L, 1L), (3L, 0L, 0L), (0L, 3L, 3L))
      .toDF("a", "b", "c")
      .select(ZOrder.zValueN(Seq($"a", $"b", $"c"), 2).as("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(7L, 9L, 54L))
    // the 2-D entry point is exactly zValueN(n=2)
    val pair = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 16).as("a"),
        ZOrder.zValueN(Seq($"x", $"y"), 16).as("b")).head()
    assert(pair.getLong(0) === pair.getLong(1))
    // width guard: 7 dims * 10 bits > 63
    intercept[IllegalArgumentException] {
      ZOrder.zValueN((1 to 7).map(_ => lit(1L)), 10)
    }
  }

  test("clusterN: 3-D clustered write bounds every file's envelope on ALL dims") {
    // a full 16^3 cube
    val cube = (0 until 4096).map { i =>
      ((i % 16).toLong, ((i / 16) % 16).toLong, (i / 256).toLong)
    }.toDF("x", "y", "w")
    val dir = Files.createTempDirectory("zorder-nd").toString
    ZOrder.clusterN(cube, Seq("x", "y", "w"), bits = 4, numPartitions = 8)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096L)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"),
        (max($"w") - min($"w")).as("sw"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), avg($"sw").as("aw"),
        count(lit(1)).as("nf"))
      .head()
    assert(spans.getLong(3) >= 4, s"expected a multi-file layout, got ${spans.getLong(3)} files")
    // global span is 15 per dim; 8 curve-contiguous slices of a 3-D
    // Morton cube keep every dimension's average envelope strictly
    // below the global span (a 1-D sort leaves two dims at ~15)
    assert(spans.getDouble(0) < 12.0, s"x envelope too wide: ${spans.getDouble(0)}")
    assert(spans.getDouble(1) < 12.0, s"y envelope too wide: ${spans.getDouble(1)}")
    assert(spans.getDouble(2) < 12.0, s"w envelope too wide: ${spans.getDouble(2)}")
  }

  test("curveDim is a monotone int64 image on every supported type " +
      "(r17): doubles through halved sortable bits — negatives, " +
      "subnormals, infinities — decimals through the unscaled value, " +
      "timestamps through epoch micros; strings refuse loudly") {
    val rnd = new scala.util.Random(11)
    val doubles = (0 until 500).map(_ =>
      rnd.nextGaussian() * math.pow(10.0, rnd.nextInt(30) - 15)) ++
      Seq(Double.MinValue, Double.MaxValue, -0.0, 0.0,
        java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
        Double.NegativeInfinity, Double.PositiveInfinity)
    val dd = doubles.toDF("v")
    val got = dd.select(col("v"),
      ZOrder.curveDim(dd, "v").as("img"))
      .orderBy("v").select("img").as[Long].collect().toSeq
    assert(got === got.sorted,
      "the double image must be monotone in value order")
    val dec = Seq(BigDecimal("-12.345"), BigDecimal("0.001"),
      BigDecimal("99.990")).toDF("v")
      .withColumn("v", col("v").cast("decimal(10,3)"))
    assert(dec.select(ZOrder.curveDim(dec, "v").as("i")).orderBy("i")
      .as[Long].collect().toSeq === Seq(-12345L, 1L, 99990L))
    val ts = Seq("2024-01-01 00:00:00", "2024-01-01 00:00:01")
      .toDF("s").withColumn("v", col("s").cast("timestamp"))
    assert(ts.select(ZOrder.curveDim(ts, "v").as("i")).as[Long]
      .collect().toSeq.distinct.size === 2)
    val bad = Seq("a").toDF("v")
    val e = intercept[IllegalArgumentException](ZOrder.curveDim(bad, "v"))
    assert(e.getMessage.contains("curve-cluster"), e.getMessage)
  }

  test("clusterN on a DOUBLE x LONG grid boxes BOTH dims (r17): the " +
      "sortable-bits dimension clusters as tightly as a native long") {
    val grid = (0 until 4096)
      .map(i => (((i % 64) - 32) * 0.25, (i / 64).toLong)).toDF("x", "y")
    val dir = Files.createTempDirectory("zorder-dbl").toString
    ZOrder.clusterN(grid, Seq("x", "y"), bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096L)
    assert(back.select("x", "y").as[(Double, Long)].collect().toSet
      === grid.as[(Double, Long)].collect().toSet,
      "clustering must not perturb double values")
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), count(lit(1)).as("nf"))
      .head()
    val (ax, ay, nf) = (spans.getDouble(0), spans.getDouble(1), spans.getLong(2))
    assert(nf >= 8, s"expected a multi-file layout, got $nf files")
    // x spans [-8, 7.75] (global 15.75), y [0, 63]: both must box
    // well below global — the double dim through sortable bits must
    // not degrade vs a native long dim
    assert(ax < 8.0, s"double-dim envelope too wide: $ax")
    assert(ay < 32.0, s"y envelope too wide: $ay")
  }

  test("clustered write yields tight per-file envelopes on BOTH dims") {
    // a full 64x64 grid; insertion order irrelevant (cluster reshuffles)
    val grid = (0 until 4096)
      .map(i => ((i % 64).toLong, (i / 64).toLong)).toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toString
    ZOrder.cluster(grid, "x", "y", bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir)
    // content preserved
    assert(back.count() === 4096L)
    assert(back.select("x", "y").as[(Long, Long)].collect().toSet
      === grid.as[(Long, Long)].collect().toSet)

    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx").as("ax"), avg($"sy").as("ay"), count(lit(1)).as("nf"))
      .head()
    val (ax, ay, nf) = (spans.getDouble(0), spans.getDouble(1), spans.getLong(2))
    assert(nf >= 8, s"expected a multi-file layout, got $nf files")
    // global span is 63 on each dim; a 1-D sort leaves the other dim at
    // ~63 per file, while the z-curve boxes both. Bound generously above
    // the ideal 16x16 tile (span 15) to absorb range-boundary jitter.
    assert(ax < 32.0, s"x envelope too wide: $ax")
    assert(ay < 32.0, s"y envelope too wide: $ay")
  }
}
