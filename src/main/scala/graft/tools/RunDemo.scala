package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Runner
import graft.catalog.TableCatalog
import graft.io.Sources
import java.nio.file.{Files, Paths}

/** Demo CLI: synthesizes a minimal two-date fraud world (one positive per
  * rule), runs the full per-date pipeline, prints the resulting report and
  * warehouse layout. Usage: runMain graft.tools.RunDemo [rootDir]
  * (default: a temp dir; rerunning against an existing root exercises
  * reprocessing idempotency). */
object RunDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    def write(p: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(p), lines.mkString("\n").getBytes("UTF-8"))

    // source snapshots (info.* shapes)
    Files.createDirectories(Paths.get(s"$root/src"))
    Seq(("C1", "Ivanov", "Ivan", "Ivanovich", "1980-01-01", "P1", "2030-01-01", "+7001"),
        ("C2", "Petrov", "Petr", "Petrovich", "1981-01-01", "P2", "2020-06-30", "+7002"))
      .toDF("client_id", "last_name", "first_name", "patronymic",
        "dob", "passport_num", "pvt", "phone")
      .selectExpr("client_id", "last_name", "first_name", "patronymic",
        "cast(dob as date) as date_of_birth", "passport_num",
        "cast(pvt as date) as passport_valid_to", "phone")
      .write.mode("overwrite").parquet(s"$root/src/clients.parquet")
    Seq(("A1", "2030-01-01", "C1"), ("A2", "2030-01-01", "C2"))
      .toDF("account", "vt", "client")
      .selectExpr("account", "cast(vt as date) as valid_to", "client")
      .write.mode("overwrite").parquet(s"$root/src/accounts.parquet")
    Seq(("K1", "A1"), ("K2", "A2")).toDF("card_num", "account")
      .write.mode("overwrite").parquet(s"$root/src/cards.parquet")

    // date drop 01012021 if not already archived (idempotent rerun support)
    if (!Files.exists(Paths.get(s"$in/archive/transactions_01012021.txt.backup"))) {
      write(s"$in/terminals_01012021.csv", Seq(
        "terminal_id,terminal_type,terminal_city,terminal_address",
        "T1,ATM,Moscow,Addr1", "T2,POS,Kazan,Addr2"))
      write(s"$in/passport_blacklist_01012021.csv", Seq("passport,date", "P1,2020-12-30"))
      write(s"$in/transactions_01012021.txt", Seq(
        "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal",
        "TX1;2021-01-01 09:00:00;K1;PAYMENT;10,50;SUCCESS;T1",
        "TX2;2021-01-01 09:10:00;K2;PAYMENT;20,00;SUCCESS;T1"))
    } else {
      // restore from archive for a reprocessing run
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s"$in/archive")).iterator().asScala.foreach { p =>
        Files.copy(p, Paths.get(in, p.getFileName.toString.stripSuffix(".backup")),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val cat = new TableCatalog(spark, s"$root/warehouse")
    new Runner(spark, cat, new Sources.SnapshotSourceDb(s"$root/src"))
      .run(in)

    println(s"[demo] root: $root")
    println("[demo] warehouse layout:")
    Files.walk(Paths.get(s"$root/warehouse"), 2).sorted().forEach(p =>
      println("  " + Paths.get(s"$root/warehouse").relativize(p)))
    println("[demo] rep_fraud:")
    cat.read("rep_fraud").orderBy("event_dt").show(50, truncate = false)
    println("[demo] fact_transactions rows: " + cat.read("fact_transactions").count())
    spark.stop()
  }
}
