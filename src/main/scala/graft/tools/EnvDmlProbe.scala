package graft.tools

/** Debug probe for multi-gen envelope DML (r18 dev tool). */
object EnvDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("envprobe").toString
    spark.conf.set("spark.sql.catalog.gep",
      classOf[graft.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.gep.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    spark.sql("CREATE TABLE gep.t (k BIGINT, v BIGINT, y STRING) " +
      "PARTITIONED BY (y)")
    def rows(lo: Long) = ((lo to lo + 24L).map(k => (k, k, "a")) ++
      (lo + 1000L to lo + 1024L).map(k => (k, k, "b")))
    cat.insertPartitioned("t", rows(0L).toDF("k", "v", "y"))
    cat.repartitionTableLazy("t",
      Seq(("identity", "y", 0), ("bucket", "k", 2)))
    cat.insertPartitioned("t", rows(100L).toDF("k", "v", "y"))
    println("[probe] gens=" + cat.specGenerations("t"))
    cat.analyze("t", skipCols = Seq("v"))
    println("[probe] envs=" + cat.fileEnvelopes("t").size +
      " skipCols=" + cat.stats("t").map(_.skipCols))
    cat.fileEnvelopes("t").foreach(f => println("[probe] env " +
      f.file.split("/t/").last + " min=" + f.min + " max=" + f.max))
    println("[probe] pre count=" + cat.read("t").count())
    println("[probe] pre k1105=" + cat.read("t")
      .filter(col("k") === 1105L).collect().mkString(","))
    spark.sql("UPDATE gep.t SET v = -5 WHERE v = 1105")
    println("[probe] post count=" + cat.read("t").count())
    println("[probe] post k1105=" + cat.read("t")
      .filter(col("k") === 1105L).collect().mkString(","))
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "t"))
    try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => println("[probe] file " +
        java.nio.file.Paths.get(root, "t").relativize(p)))
    finally st.close()
    spark.stop()
  }
}
