package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: prints the analyzed/optimized join-condition expression tree
  * for the J3 range-join shape (used to pin the exact Catalyst classes the
  * BucketRangeJoin rule must match). */
object CondProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r1 = ev.select(col("event_id"), col("user_id"), col("ts"))
    val r2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"))
    val j = r1.join(r2, col("user_id") === col("u2") &&
      col("ts2").between(col("ts"), col("ts") + expr("INTERVAL 20 MINUTES")))
    val plan = j.queryExecution.optimizedPlan
    plan.foreach {
      case join: org.apache.spark.sql.catalyst.plans.logical.Join =>
        join.condition.foreach { c =>
          c.foreach(e => println(s"${e.getClass.getName}  ::  $e"))
        }
      case _ =>
    }
    spark.stop()
  }
}
