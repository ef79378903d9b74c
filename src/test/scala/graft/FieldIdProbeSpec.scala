package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the upstream Spark parquet field-id semantics the column-
  * mapping design depends on (measured in r11, Spark 4.1): a read
  * schema carrying ids matches file columns BY ID across files whose
  * NAMES disagree, pushdown included; and a file with no ids at all
  * under an id-bearing read schema refuses loudly instead of
  * null-filling. If either pin breaks on a Spark upgrade, RENAME
  * COLUMN's correctness argument breaks with it. */
class FieldIdProbeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong("parquet.field.id", id.toLong).build())

  test("id-based reads unify files whose column names disagree") {
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dir = Files.createTempDirectory("fid").toString
    val schA = StructType(Seq(withId(StructField("k", LongType), 1),
      withId(StructField("v", LongType), 2)))
    spark.createDataFrame(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").rdd, schA)
      .coalesce(1).write.mode("append").parquet(dir)
    val schB = StructType(Seq(withId(StructField("k", LongType), 1),
      withId(StructField("w", LongType), 2)))
    spark.createDataFrame(Seq((3L, 30L)).toDF("k", "w").rdd, schB)
      .coalesce(1).write.mode("append").parquet(dir)
    val readSch = StructType(Seq(withId(StructField("k", LongType), 1),
      withId(StructField("w", LongType), 2)))
    assert(spark.read.schema(readSch).parquet(dir)
      .as[(Long, Long)].collect().toSet
      === Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // filter pushdown on the renamed column prunes by id too
    assert(spark.read.schema(readSch).parquet(dir)
      .filter(col("w") === 20L).as[(Long, Long)].collect().toSet
      === Set((2L, 20L)))
  }

  test("an id-bearing schema over an id-less file is loud, never lossy") {
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dir = Files.createTempDirectory("fid2").toString
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try Seq((1L, 10L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    finally spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val readSch = StructType(Seq(withId(StructField("k", LongType), 1),
      withId(StructField("v", LongType), 2)))
    val e = intercept[Exception](
      spark.read.schema(readSch).parquet(dir).collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("field Id")),
      s"expected the loud no-field-ids refusal, got: ${chain(e).take(3)}")
  }
}
