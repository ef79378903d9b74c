package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r5 next #6): synthesize an sf1-scale dataset from
  * sf0.1 and time the heaviest queries once at 10× the gate's data, to
  * catch superlinear cliffs the 0.1 bench can't see. Not part of the
  * driver contract.
  *
  * Scaling model: `copies` key-shifted replicas of every fact table
  * (dimension tables `region`/`nation` stay as-is, and `*_nationkey` /
  * `*_regionkey` columns keep referencing them). Entity keys shift by
  * copy·OFFSET so every copy joins within itself exactly like the
  * original. Crucially the probe scales EXTENT, not DENSITY — a first
  * attempt that replicated rows verbatim measured workload quadratics,
  * not the engine (10× events in the same time range = 100× interval-
  * join pair work; 10 near-identical copies of each doc = 10-cliques in
  * every near-dup graph):
  *   - event timestamps shift by copy·span, so per-hour density — what
  *     interval/sessionize/velocity costs actually key on — is
  *     constant while history grows 10×;
  *   - document copies keep their token MULTISET but get a per-copy
  *     hash-shuffled word order, so token stats stay realistic while
  *     shingle sets differ — near-dup density per doc stays that of
  *     the original corpus instead of growing with `copies`.
  */
object ScaleProbe {
  private val Offset = 1000000000L

  // columns that are entity keys (shift per copy); *_nationkey and
  // *_regionkey deliberately absent — they reference unscaled dims
  private val shiftCols = Set(
    "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey",
    "event_id", "user_id", "doc_id", "vec_id")

  def scaleTable(df: DataFrame, copies: Int, name: String): DataFrame = {
    // event-time span in MICROS for per-copy time shifting; the caller
    // normalizes ts to TimestampType via TestdataQueries.readEvents
    val tsSpan: Long =
      if (name == "events") {
        val r = df.agg(unix_micros(min(col("ts"))),
          unix_micros(max(col("ts")))).head()
        r.getLong(1) - r.getLong(0) + 86400L * 1000000L
      } else 0L
    (0 until copies).map { i =>
      val shifted = df.columns.foldLeft(df) { (acc, c) =>
        if (shiftCols(c)) acc.withColumn(c, col(c) + lit(i * Offset)) else acc
      }
      val timed =
        if (name == "events" && i > 0)
          shifted.withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + lit(i * tsSpan)))
        else shifted
      if (name == "documents" && i > 0)
        // vocabulary-disjoint ISOMORPHIC copy: every word carries a
        // copy suffix — word order, token frequencies (the Zipf shape
        // frequency-based pruning keys on) and within-copy near-dup
        // structure are preserved exactly, while copies share no
        // shingles. Rejected alternatives, both measured: verbatim
        // copies create 10-cliques in every near-dup graph (quadratic
        // pair work), and hash-shuffled word order flattens the shingle
        // distribution and degenerates prefix/maxDocFreq pruning.
        timed.withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(i.toString))), " "))
      else timed
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dstDir = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val queries = args.lift(3).map(_.split(",").toSeq).getOrElse(Seq(
      "x_stream_lsh", "x_bpe", "x_bpe_apply", "x_curation_pipeline",
      "c7_bruteforce", "x_dedup_canonical", "x_setjoin_prefix",
      "x_ann_pq", "x_dedup_incremental", "x_dedup_components",
      "x_dedup_corpus", "x_triangles", "x_sessionize", "x_pagerank"))

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gen = !java.nio.file.Files.exists(java.nio.file.Paths.get(dstDir))
    if (gen) {
      val t0 = System.nanoTime()
      val plain = Seq("region", "nation")
      val scaled = Seq("customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      plain.foreach { n =>
        spark.read.parquet(s"$srcDir/$n.parquet")
          .write.parquet(s"$dstDir/$n.parquet")
      }
      scaled.foreach { n =>
        // normalize events.ts to TimestampType up front (schema-adaptive
        // over the generator's nanos/us variants); written back as
        // TIMESTAMP(MICROS), which t()'s reader passes through unchanged
        val df =
          if (n == "events") graft.queries.TestdataQueries.readEvents(spark, srcDir)
          else spark.read.parquet(s"$srcDir/$n.parquet")
        scaleTable(df, copies, n).write.parquet(s"$dstDir/$n.parquet")
      }
      println(f"[probe] generated $dstDir at ${copies}x in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    queries.foreach { q =>
      graft.SparkEntry.queries.get(q) match {
        case None => println(s"[probe] $q: no such query")
        case Some(fn) =>
          val t0 = System.nanoTime()
          try {
            val n = fn(spark, dstDir).count()
            println(f"[probe] $q%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
          } catch {
            case e: Throwable =>
              println(f"[probe] $q%-24s FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s: ${e.getMessage.take(200)}")
          }
      }
    }
    spark.stop()
  }
}
