package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe: stage-by-stage timings and candidate-pair
  * profiles for the dedup operators. Dev tool, not part of the driver
  * contract. Usage: runMain graft.tools.Probe <sfDir>. */
object Probe {
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
    println(s"[probe] docs: ${docs.count()}")

    // minhash stage profile
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles")(sh.select(sum(size(col("sh")))).collect())
    val sig = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 16).as("sig"))
    time("signatures")(sig.select(sum(size(col("sig")))).collect())
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * 2 + 1, 2)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    time("banded count")(println("  banded rows: " + banded.count()))
    time("bucket profile") {
      banded.groupBy("band", "bucket").count()
        .agg(max("count").as("max_bucket"), count(lit(1)).as("n_buckets"),
          sum(col("count") * col("count")).as("sum_sq")).show()
    }
    time("full minhashLsh")(println("  pairs: " +
      Dedup.minhashLsh(docs, "doc_id", "text").count()))

    // jaccard profile
    time("ngramJaccard")(println("  pairs: " +
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.1, 1000).count()))
    val shx = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
    time("shingle explode")(println("  rows: " + shx.count()))
    time("df profile")(shx.groupBy("shingle").count()
      .agg(max("count"), count(lit(1)), sum(col("count") * col("count"))).show())

    spark.stop()
  }
}
