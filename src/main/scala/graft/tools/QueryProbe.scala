package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling probe (never run by the driver): runs ONE named
  * SparkEntry query with a listener that prints per-job wall time and
  * per-stage shuffle/input metrics to stderr, so a protocol query's
  * cost can be attributed to its individual Spark jobs.
  *
  * Usage: runMain graft.tools.QueryProbe <queryName> [sfDir] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ad-hoc conf experiments (dev-only): PROBE_CONF="k=v;k=v"
    val extra = sys.env.get("PROBE_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect {
        case Array(k, v) => (k, v)
      }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]"))((b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROBE_MIN_PART_SIZE", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobStart(e.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (record && ms >= 5)
            lines.add(f"JOB ${e.jobId}%5d ${ms}%9.1f ms  $desc")
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        if (record && tm != null) {
          val ms = si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)
          if (ms >= 100)
            lines.add(f"  STAGE ${si.stageId}%5d ${ms}%7d ms cpuSum=${tm.executorRunTime}%7d ms tasks=${si.numTasks}%4d " +
              f"in=${tm.inputMetrics.bytesRead / 1e6}%8.1fMB " +
              f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
              f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
              f"spill=${tm.diskBytesSpilled / 1e6}%6.1fMB  ${si.name.take(90)}")
        }
      }
    })

    // same warm-up as Bench so the first rep isn't billed JVM startup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.queries.TestdataQueries.readEvents(spark, sfDir).count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      record = rep == reps // only record the last (warmed) rep
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $name rep $rep: $sec%.3f s")
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => }
    }
    Thread.sleep(500)
    lines.forEach(l => System.err.println(l))
    spark.stop()
  }
}
