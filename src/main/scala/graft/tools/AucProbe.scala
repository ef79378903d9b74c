package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AucProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s  (rows=$n)")
    }
    val ev = graft.queries.TestdataQueries.readEvents(spark, dir)
    tm("events.count")(ev.count())
    val per = ev.groupBy(col("user_id"))
      .agg(sum(floor(col("value")*100).cast("long")).as("sc"),
        when(sum(when(col("event_type")==="purchase",1L).otherwise(0L)) >
             sum(when(col("event_type")==="click",1L).otherwise(0L)),1L)
          .otherwise(0L).as("y"))
    tm("per.count")(per.count())
    val ranked = graft.ops.Packing.withGlobalRank(per, Seq("sc","user_id"), "pos")
    tm("ranked.count")(ranked.count())
    val ck = ranked.localCheckpoint(true)
    tm("checkpoint")(ck.count())
    val grp = ck.groupBy(col("sc").as("sc2")).agg(min(col("pos")).as("lo"), count(lit(1)).as("tie"))
    tm("grp.count")(grp.count())
    val mid2 = ck.join(grp, col("sc")===col("sc2")).withColumn("mr2", lit(2L)*col("lo")+col("tie")-1L)
    tm("mid2.agg")(mid2.agg(sum(col("mr2"))).count())
    spark.stop()
  }
}
