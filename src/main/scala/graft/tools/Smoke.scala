package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry must return >0 rows
  * on sf0.001. Usage: runMain graft.tools.Smoke */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows: $n schema: ${df.schema.fieldNames.mkString(",")}")
    df.show(5, truncate = false)
    println(if (n > 0) "[smoke] PASS" else "[smoke] FAIL")
    spark.stop()
  }
}
