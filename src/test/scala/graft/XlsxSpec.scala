package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Sources, Xlsx, XlsxAdapter}
import graft.schemas.Schemas
import java.nio.file.Files

/** S3/S4 — the native XLSX reader against files built from raw OOXML
  * parts (shared strings, inline strings, numeric cells, date serials,
  * sparse rows). */
class XlsxSpec extends AnyFunSuite with SparkTestSession {

  import XlsxTestWriter.writeXlsx

  test("terminals xlsx drop reads through Sources.readTerminals") {
    val dir = Files.createTempDirectory("xlsx")
    val p = s"$dir/terminals_01012021.xlsx"
    writeXlsx(p, "terminals", Seq(
      Seq("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
      Seq("T1", "ATM", "Moscow", "Addr1"),
      Seq("T2", "POS", "Kazan", null)))   // sparse row: missing address
    val df = Sources.readTerminals(spark, p, new XlsxAdapter("terminals"))
    val rows = df.orderBy("terminal_id").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("T1", "T2"))
    assert(rows(1).isNullAt(3))
    assert(df.schema === Schemas.stgTerminals)
  }

  test("blacklist xlsx: Excel date serials convert; header-name mapping + rename") {
    val dir = Files.createTempDirectory("xlsx")
    val p = s"$dir/passport_blacklist_01012021.xlsx"
    // 44196 = 2020-12-31 (days since 1899-12-30)
    writeXlsx(p, "blacklist", Seq(
      Seq("passport", "date"),
      Seq("P1", "#44196"),
      Seq("P2", "2021-01-02")))
    val df = Sources.readBlacklist(spark, p, new XlsxAdapter("blacklist"))
    val m = df.collect().map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(m === Map("P1" -> "2020-12-31", "P2" -> "2021-01-02"))
    assert(df.schema.fieldNames.toSeq === Seq("passport_num", "entry_dt"))
  }

  test("missing sheet name raises a clear error listing available sheets") {
    val dir = Files.createTempDirectory("xlsx")
    val p = s"$dir/x.xlsx"
    writeXlsx(p, "data", Seq(Seq("a"), Seq("1")))
    val e = intercept[IllegalArgumentException](Xlsx.readSheet(p, "nope"))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("data"))
  }

  test("numeric and boolean cells convert by target schema type") {
    import org.apache.spark.sql.types._
    assert(Xlsx.convert("12,50", DecimalType(18, 2)).toString === "12.50")
    assert(Xlsx.convert("3.0", IntegerType) === 3)
    assert(Xlsx.convert("", StringType) === null)
    assert(Xlsx.convert("44196.5", TimestampType).toString === "2020-12-31 12:00:00.0")
  }
}
