package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc probe for the connected-components implementations: per-round
  * timings/edge counts of the alternating-star loop vs GraphX Pregel on
  * the bench corpus's near-dup pair graph. Dev tool, not part of the
  * driver contract. Usage: runMain graft.tools.CcProbe <sfDir>. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.ops.Dedup
    val pairs = time("pairs (ngramJaccard, materialized)") {
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, 1000)
        .localCheckpoint(true)
    }
    println(s"[probe] pair count: ${pairs.count()}")

    // instrumented copy of Dedup.components' loop
    time("alternating-star total") {
      var edges = pairs
        .select(greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("u"),
          least(col("id_a").cast("long"), col("id_b").cast("long")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      var prevCnt = edges.count()
      println(s"[probe]   round 0 edges=$prevCnt")
      var converged = prevCnt == 0L
      var round = 0
      while (!converged) {
        round += 1
        val small = time(s"  round $round compute") {
          val sym = edges.select(col("u"), col("v"))
            .union(edges.select(col("v").as("u"), col("u").as("v")))
          val large = sym
            .withColumn("m", min(least(col("v"), col("u")))
              .over(Window.partitionBy("u")))
            .filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
          large
            .select(greatest(col("u"), col("v")).as("u"),
              least(col("u"), col("v")).as("v"))
            .withColumn("m", min(col("v")).over(Window.partitionBy("u")))
            .select(explode(array(
              struct(col("v").as("a"), col("m").as("b")),
              struct(col("u").as("a"), col("m").as("b")))).as("e"))
            .select(col("e.a").as("u"), col("e.b").as("v"))
            .filter(col("u") =!= col("v")).distinct()
            .localCheckpoint(true)
        }
        val cnt = small.count()
        converged = time(s"  round $round convergence check") {
          cnt == prevCnt && small.exceptAll(edges).isEmpty
        }
        println(s"[probe]   round $round edges=$cnt converged=$converged")
        edges = small
        prevCnt = cnt
      }
    }

    time("Dedup.components (as shipped)") {
      println("  rows: " + Dedup.components(pairs).count())
    }
    time("GraphX Pregel") {
      println("  rows: " + Dedup.componentsGraphx(pairs).count())
    }
    spark.stop()
  }
}
