package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Similarity}

/** Dev probe: measures the IVF top-k overlap against brute force on the
  * testdata embeddings across executor-thread counts, to pick a recall
  * bound for the x_ann_ivf property oracle that is robust to the
  * driver's parallelism choice. Not part of the driver contract. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (cpus <- Seq("2", "4", "8", "32")) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= 0)
      val idx = Ivf.build(base, "vec_id", "embedding", nLists = 16)
      val ivfTop = Ivf.topK(idx, "vec_id", "embedding", q, k = 10, nProbe = 4)
        .select(col("vec_id"))
      def hits(k: Int): Long =
        ivfTop.join(Similarity.bruteForceTopK(base, "vec_id", "embedding", q, k)
          .select(col("vec_id")), Seq("vec_id"), "left_semi").count()
      println(s"[ivfprobe] cpus=$cpus n=${ivfTop.count()} hits10=${hits(10)} hits50=${hits(50)} hits100=${hits(100)}")
      spark.stop()
    }
  }
}
