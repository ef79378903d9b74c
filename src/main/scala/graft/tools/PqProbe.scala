package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures PQ-ANN recall vs exact L2 on the testdata embeddings at a
  * given SF — the margins behind x_ann_pq's property oracle. Dev tool.
  * Usage: runMain graft.tools.PqProbe <sfDir>. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Pq

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    println(s"[probe] dim=$dim rows=${e.count()}")
    for (qid <- Seq(0L, 1L, 2L, 3L, 4L)) {
      val q = e.filter(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val base = e.filter(col("vec_id") =!= qid)
      val cb = Pq.trainCodebooks(base, "vec_id", "embedding", dim)
      val l2 = aggregate(zip_with(col("embedding"), typedLit(q),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
      val exact = base.withColumn("d", l2)
        .orderBy(col("d").asc, col("vec_id").asc).limit(50)
        .withColumn("bf_rank", row_number().over(
          Window.orderBy(col("d").asc, col("vec_id").asc)))
        .select(col("vec_id"), col("bf_rank"))
      val pq = Pq.topK(Pq.encode(base, "embedding", cb), "vec_id", "pq_code",
        cb, q, k = 10).select(col("vec_id"))
      val joined = pq.join(exact, Seq("vec_id"), "left")
        .agg(sum(when(col("bf_rank") <= 10, 1).otherwise(0)).as("h10"),
          sum(when(col("bf_rank").isNotNull, 1).otherwise(0)).as("h50"))
        .head()
      println(s"[probe] q=$qid hits@10=${joined.getLong(0)} in-top-50=${joined.getLong(1)}")
    }

    // distortion: mean ||v - decode(encode(v))||^2 / mean ||v||^2, and
    // ADC-vs-exact relative error over the PQ top-10
    val q0 = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val base = e.filter(col("vec_id") =!= 0L)
    val cb = Pq.trainCodebooks(base, "vec_id", "embedding", dim)
    val subDim = dim / cb.length
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val enc = Pq.encode(base, "embedding", cb)
    val recon = flatten(zip_with(col("pq_code"), cbLit,
      (cd, cws) => element_at(cws, cd + 1)))
    val errSq = aggregate(zip_with(col("embedding"), recon,
      (x, r) => (x - r) * (x - r)), lit(0.0), (a, v) => a + v)
    val normSq = aggregate(col("embedding"),
      lit(0.0), (a, v) => a + v * v)
    val d = enc.agg((sum(errSq) / sum(normSq)).as("rel_distortion")).head()
    println(s"[probe] rel_distortion=${d.getDouble(0)}")
    val l2q = aggregate(zip_with(col("embedding"), typedLit(q0),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val adcErr = Pq.topK(enc, "vec_id", "pq_code", cb, q0, k = 10)
      .withColumn("exact", l2q)
      .select(avg(abs(col("adc_dist") - col("exact")) / col("exact")).as("e"))
      .head()
    println(s"[probe] adc_rel_err(top10)=${adcErr.getDouble(0)}")
    spark.stop()
  }
}
