package graft.tools

/** Timing breakdown of x_quantile_wide_decimal's phases at a given SF
  * dir — which of (construction, contract probe, weighted median)
  * carries the cost. Bench probe only; not part of the query surface. */
object WideDecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions._
    // per-phase job/stage accounting (same listener as QueryProbe)
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val agg = new java.util.concurrent.atomic.AtomicLong()
    val njobs = new java.util.concurrent.atomic.AtomicLong()
    val nstages = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart(e.jobId) = System.nanoTime(); njobs.incrementAndGet()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobStart.remove(e.jobId).foreach(t0 =>
            agg.addAndGet(System.nanoTime() - t0))
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          nstages.incrementAndGet()
      })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = njobs.get(); val s0 = nstages.get(); val a0 = agg.get()
      val r = f
      Thread.sleep(200)
      println(f"[widedec] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${njobs.get() - j0} stages=${nstages.get() - s0} " +
        f"jobWall=${(agg.get() - a0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 4 === 1)
      .select(col("l_returnflag").as("g"),
        concat(floor(col("l_extendedprice") * 100).cast("long").cast("string"),
          lpad(col("l_partkey").cast("string"), 18, "0"))
          .cast("decimal(38,10)").as("v0"),
        col("l_orderkey"), col("l_quantity").cast("long").as("w"))
    val df = li.select(col("g"),
      when(col("l_orderkey") % 2 === 1, -col("v0"))
        .otherwise(col("v0")).as("v"), col("w"),
      col("l_orderkey").as("okey"))
    time("construction+count")(df.count())
    val probe = df.filter(col("okey") % 17 === 3).select(col("g"), col("v"))
    time("fast-percentiles(probe)")(
      graft.ops.Quantiles.percentilesCont(probe, "g", "v",
        Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L)),
        smallThreshold = 0L).collect())
    time("stock-percentiles(probe)")(
      probe.groupBy(col("g")).agg(
        expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
        expr("percentile(v, 0.75)")).collect())
    time("weighted-median(full)")(
      graft.ops.WeightedQuantile.weightedMedian(df, "g", "v", "w").collect())
    time("weighted-median(full) 2nd")(
      graft.ops.WeightedQuantile.weightedMedian(df, "g", "v", "w").collect())
    // isolate: the same machinery on a LONG domain at the same rows
    val dfl = df.select(col("g"),
      (col("okey") * 1000L + col("w")).as("v"), col("w"))
    time("weighted-median(long domain)")(
      graft.ops.WeightedQuantile.weightedMedian(dfl, "g", "v", "w").collect())
    // isolate: wide pv build (hi/lo split + groupBy + checkpoint)
    time("wide pv build")(
      df.select(col("g"),
        graft.functions.Decimal128Bits.hi(col("v")).as("vhi"),
        graft.functions.Decimal128Bits.lo(col("v")).as("vlo"),
        col("w").cast("long").as("w2"))
      .groupBy(col("g"), col("vhi"), col("vlo"))
      .agg(sum(col("w2")).as("vw")).localCheckpoint(true).count())
    // isolate: plain decimal groupBy without the split
    time("decimal groupBy(no split)")(
      df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
        .localCheckpoint(true).count())
    spark.stop()
  }
}
