package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Pq, Similarity}

/** Dev probe: measures the IVF+PQ composed top-k against brute force and
  * against plain IVF on the same probes, across executor-thread counts —
  * picks the x_ann_ivfpq property bounds. Not part of the driver
  * contract. */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (cpus <- Seq("2", "8", "32")) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val dimN = e.select(size(col("embedding"))).head().getInt(0)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= 0)
      val idx = Ivf.build(base, "vec_id", "embedding", nLists = 16)
      val cb = Pq.trainCodebooks(base, "vec_id", "embedding", dimN)
      val top = Ivf.topKIvfPq(idx, cb, "vec_id", "embedding", q,
        k = 10, nProbe = 4, shortlist = 50).select(col("vec_id"))
      def overlap(other: org.apache.spark.sql.DataFrame): Long =
        top.join(other, Seq("vec_id"), "left_semi").count()
      val h10 = overlap(Similarity.bruteForceTopK(base, "vec_id", "embedding", q, 10)
        .select(col("vec_id")))
      val h50 = overlap(Similarity.bruteForceTopK(base, "vec_id", "embedding", q, 50)
        .select(col("vec_id")))
      val agree = overlap(Ivf.topK(idx, "vec_id", "embedding", q, 10, 4)
        .select(col("vec_id")))
      println(s"[ivfpqprobe] sf=$sfDir cpus=$cpus n=${top.count()} h10=$h10 h50=$h50 ivf_agree=$agree")
      spark.stop()
    }
  }
}
