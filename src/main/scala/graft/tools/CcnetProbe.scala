package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe for perplexityBuckets stages (dev-only). */
object CcnetProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    import graft.ops.{Selection, TextAnalysis}
    time("unigramLogProb") {
      TextAnalysis.unigramLogProb(docs, "doc_id", "text").count()
    }
    val lm = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    time("lm+join") { lm.count() }
    time("groupedRank on lm") {
      Selection.groupedRank(lm, Seq("lang"), Seq("nll_e4", "doc_id"), "rk").count()
    }
    time("groupedNtile on lm") {
      Selection.groupedNtile(lm, Seq("lang"), Seq("nll_e4", "doc_id"), 3).count()
    }
    val pinned = lm.localCheckpoint(true)
    time("groupedNtile on pinned lm") {
      Selection.groupedNtile(pinned, Seq("lang"), Seq("nll_e4", "doc_id"), 3).count()
    }
    time("full perplexityBuckets") {
      Selection.perplexityBuckets(docs, "doc_id", "text", "lang").count()
    }
    spark.stop()
  }
}
