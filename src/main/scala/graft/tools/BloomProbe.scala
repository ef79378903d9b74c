package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import java.nio.file.{Files, Paths}

/** Dev probe (VERDICT r10 next #1 done-condition): measure the Bloom
  * point-probe metadata cost at sf1 — sidecars parsed and bytes read
  * per probe, against the table's TOTAL bloom footprint (what the
  * pre-r11 merged-leg design parsed on EVERY probe). Not part of the
  * driver contract. Usage: runMain graft.tools.BloomProbe [sf1Dir]. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    if (!Files.exists(Paths.get(sf1)))
      ScaleProbe.main(Array("/root/testdata/sf0.1", sf1, "10", "none"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = Files.createTempDirectory("bloom-probe")
    val cat = new TableCatalog(spark, scratch.toString)
    val li = spark.read.parquet(s"$sf1/lineitem.parquet").select(
      col("l_orderkey").cast("long").as("okey"),
      col("l_partkey").cast("long").as("pkey"))
    // 64 files ≈ a realistic per-partition file count; the point of
    // the measurement is the RATIO (parsed / total), which is what
    // extrapolates to an 800k-file table
    val t0 = System.nanoTime()
    cat.overwriteIndexed("li", li.repartition(64),
      skipCols = Seq.empty, bloomCols = Seq("okey"))
    println(f"[bloom] indexed 64 files in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val dir = Paths.get(cat.path("li"), "_bloom")
    val sidecars = {
      val s = Files.list(dir)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(p => p -> Files.size(p)).toMap }
      finally s.close()
    }
    val totalBytes = sidecars.values.sum
    val total = cat.fileEnvelopes("li").size
    println(f"[bloom] files=$total sidecars=${sidecars.size} " +
      f"totalBloomBytes=${totalBytes / 1024.0}%.0f KB " +
      f"avgSidecar=${totalBytes / math.max(1, sidecars.size) / 1024.0}%.1f KB")

    def probe(label: String, key: Long): Unit = {
      val p0 = TableCatalog.bloomSidecarParses.get()
      val t0 = System.nanoTime()
      val kept = cat.pointKeepFiles("li", Seq(("okey", key)))
      val dt = (System.nanoTime() - t0) / 1e3
      val parses = TableCatalog.bloomSidecarParses.get() - p0
      val avg = totalBytes.toDouble / math.max(1, sidecars.size)
      println(f"[bloom] $label%-28s key=$key%-12d kept=${kept.size}%3d/" +
        f"$total parses=$parses%3d (~${parses * avg / 1024.0}%.1f KB of " +
        f"${totalBytes / 1024.0}%.0f KB) ${dt}%.0f us")
    }
    probe("cold probe", 1L)
    probe("warm probe (same key)", 1L)
    probe("warm probe (new key)", 7L)
    probe("warm probe (copy-shifted)", 1000000001L)
    probe("warm probe (absent key)", 999999L)

    // the clustered layout: okey-range-partitioned files give TIGHT
    // envelopes, so the prefilter bounds candidates to ~1 file and the
    // probe parses ~1 sidecar — the composition that holds at 800k
    // files (envelope candidates, then bloom, then scan)
    cat.overwriteIndexed("li_sorted",
      li.repartitionByRange(64, col("okey")),
      skipCols = Seq("okey"), bloomCols = Seq("okey"))
    val total2 = cat.fileEnvelopes("li_sorted").size
    val dir2 = Paths.get(cat.path("li_sorted"), "_bloom")
    val bytes2 = {
      val s = Files.list(dir2)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(Files.size).sum }
      finally s.close()
    }
    def probeSorted(label: String, key: Long): Unit = {
      val p0 = TableCatalog.bloomSidecarParses.get()
      val kept = cat.pointKeepFiles("li_sorted", Seq(("okey", key)))
      val parses = TableCatalog.bloomSidecarParses.get() - p0
      println(f"[bloom] $label%-28s key=$key%-12d kept=${kept.size}%3d/" +
        f"$total2 parses=$parses%3d (of ${bytes2 / 1024.0}%.0f KB total)")
    }
    probeSorted("sorted cold probe", 1L)
    probeSorted("sorted cold probe 2", 3000000L)
    probeSorted("sorted warm probe", 1L)
    spark.stop()
  }
}
