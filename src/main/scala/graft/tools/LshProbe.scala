package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timings for the streaming-dedup maintenance fixture
  * (x_stream_lsh) — identifies which per-batch catalog operation
  * dominates. Not part of the driver contract. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val scratch = java.nio.file.Files.createTempDirectory("lsh_probe")
    val cat = new graft.catalog.TableCatalog(spark, scratch.resolve("wh").toString)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = docs.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val groups = rows.grouped(rows.length / 3 + 1).toSeq
    var applied = -1L
    groups.zipWithIndex.foreach { case (g, batchId) =>
      println(s"[probe] === batch $batchId (${g.length} docs)")
      val batch = g.toSeq.toDF("doc_id", "text")
      batch.persist()
      val banded = timed("lshIndex build+persist") {
        val b = graft.ops.Dedup.lshIndex(batch, "doc_id", "text").persist()
        b.count(); b
      }
      val idx = cat.readOrEmpty("lsh_index",
          banded.withColumn("batch_id", lit(0L)).schema)
        .filter(col("batch_id") <= applied)
        .select(banded.columns.map(col).toIndexedSeq: _*)
      val knownIds = timed("knownIds semi join") {
        val k = idx.join(broadcast(banded.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi").select(col("doc_id")).distinct()
        k.persist().count(); k
      }
      val fresh = timed("fresh anti join") {
        val f = banded.join(broadcast(knownIds), Seq("doc_id"), "left_anti").persist()
        f.count(); f
      }
      val pairs = graft.ops.Dedup.incrementalPairsBanded(idx, fresh, 16)
      timed("pairs write (partitioned)") {
        cat.appendPartitioned("pairs",
          pairs.withColumn("batch_id", lit(batchId.toLong)), "batch_id")
      }
      timed("index write (partitioned)") {
        cat.appendPartitioned("lsh_index",
          fresh.withColumn("batch_id", lit(batchId.toLong)), "batch_id")
      }
      timed("docs write (partitioned)") {
        cat.appendPartitioned("docs",
          batch.select(col("doc_id"), col("text"))
            .join(broadcast(knownIds.withColumnRenamed("doc_id", "doc_id")),
              Seq("doc_id"), "left_anti")
            .withColumn("batch_id", lit(batchId.toLong)), "batch_id")
      }
      timed("marker swap") {
        cat.putMarker("pairs__commit", batchId.toLong)
      }
      applied = batchId.toLong
      banded.unpersist(); batch.unpersist(); knownIds.unpersist(); fresh.unpersist()
    }
    spark.stop()
  }
}
