package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter semi-join reduction: build a bloom filter over the
  * build side's join keys, pre-filter the probe side with `might_contain`
  * BEFORE its shuffle, then run the exact join. False positives are harmless
  * (the exact join removes them); there are no false negatives, so the result
  * is identical to the plain join — which is exactly what the oracle checks.
  *
  * This is the manual form of Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`), for the cases where that rule does not fire
  * (non-shuffle-stage builds, DataFrame-composed plans, filters the optimizer
  * cannot see are selective). At 100 TB the probe-side shuffle is the cost
  * center of a selective join: a few-MB bloom sketch broadcast into the scan
  * stage drops non-matching rows before they are ever serialized into the
  * exchange, and the `might_contain` predicate sits inside whole-stage
  * codegen next to the scan.
  *
  * The sketch itself is built by a single Spark aggregation (map-side partial
  * merge of per-partition filters) and ships to the driver once as a binary
  * literal — bounded by `numBits/8` bytes, independent of build-side row
  * count. That driver hop is the same pattern as
  * `DataFrameStatFunctions.bloomFilter` and is NOT a data collect.
  */
object BloomJoin {

  /** Bloom sketch of `keys` in `build` as a binary literal Column, built
    * distributed and collected once (sketch bytes only). Keys are xxhash64'd
    * to longs on both build and probe sides, matching Spark's runtime-filter
    * convention. */
  def keyFilter(build: DataFrame, buildKey: String,
                expectedItems: Long, fpp: Double = 0.03): Column = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate silently clamps both parameters to the
    // runtime-filter session maxima (Math.min in the constructor) — a
    // clamped sketch degrades fpp toward 1 and the pre-filter silently
    // stops pruning. Fail loudly instead: at 100 TB a no-op bloom pass
    // that LOOKS installed is worse than an error telling the operator
    // to raise the confs.
    val sess = build.sparkSession.conf
    val maxItems = sess.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = sess.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sketch for $expectedItems items needs $numBits bits, over the " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits) — " +
        "BloomFilterAggregate would silently clamp and stop pruning; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits or " +
        "lower expectedItems/fpp")
    val hashed = XxHash64(Seq(CatalystBridge.expression(build.col(buildKey))), 42L)
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = build.select(CatalystBridge.column(agg)).head().getAs[Array[Byte]](0)
    CatalystBridge.column(Literal(bytes, BinaryType))
  }

  /** `might_contain(filter, xxhash64(key))` predicate over a probe column. */
  def mightContain(filterBytes: Column, probeKey: Column): Column =
    CatalystBridge.column(BloomFilterMightContain(
      CatalystBridge.expression(filterBytes),
      XxHash64(Seq(CatalystBridge.expression(probeKey)), 42L)))

  /** Inner join `probe ⋈ build` on `probeKey = buildKey`, with the probe side
    * bloom-pruned before its exchange. Result is row-identical to the plain
    * inner join. `expectedItems` sizes the sketch — pass (an upper bound on)
    * the build side's distinct key count; at the default 3% fpp the sketch is
    * ~0.9 bytes per key. */
  def inner(probe: DataFrame, build: DataFrame,
            probeKey: String, buildKey: String,
            expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = keyFilter(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(bloom, probe.col(probeKey)))
      .join(build, probe.col(probeKey) === build.col(buildKey))
  }
}
