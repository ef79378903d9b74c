package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc CLONE wall-time probe at file-count scale (r11 verdict #5:
  * "clone of a ≥5k-file table with measured wall time"). Builds a
  * versioned table of N tiny files (the clone's cost is O(files)
  * metadata, not bytes), analyzes it (skip + bloom so the full sidecar
  * family travels), and times cloneTable — the parallel-link assembly
  * plus the stats/envelope/Bloom re-key. Dev tool, not part of the
  * driver contract. Usage: runMain graft.tools.CloneProbe [nFiles]. */
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // keep nFiles exact
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("cloneprobe")
    val cat = new graft.catalog.TableCatalog(spark, root.toString)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cloneprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time(s"build src ($nFiles files)") {
      cat.replaceAtomic("src",
        spark.range(0L, nFiles.toLong * 4, 1L, nFiles)
          .select(col("id").as("k"), (col("id") % 97).as("m"),
            concat(lit("u"), col("id")).as("s")))
    }
    time("analyze (skip k + bloom s)") {
      cat.analyze("src", cols = Seq("k", "m"), skipCols = Seq("k"),
        bloomCols = Seq("s"))
    }
    val files = cat.stats("src").map(_.fileCount).getOrElse(-1L)
    println(s"[cloneprobe] src fileCount=$files")
    time(s"cloneTable ($files files + sidecars)") {
      cat.cloneTable("src", "dst")
    }
    // the carried stats really serve the clone (no re-analyze)
    assert(cat.stats("dst").exists(_.version.contains(1L)))
    assert(cat.fileEnvelopes("dst").size == files)
    time("prunedRead on the clone (carried envelopes)") {
      println("[cloneprobe] pruned rows = " +
        cat.prunedRead("dst", Seq(("k", 0L, 10L))).count())
    }
    graft.catalog.TableCatalog.deleteRecursively(root)
    spark.stop()
  }
}
