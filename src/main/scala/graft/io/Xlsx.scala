package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.LocalDate
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal native XLSX reader — S3/S4 (reference main.py:98, 111 read
  * `terminals_{date}.xlsx` / `passport_blacklist_{date}.xlsx` via pandas).
  * No external dependency: an .xlsx file is a zip of OOXML parts, parsed
  * here with the JDK's StAX. Supports what daily tabular drops use:
  * shared/inline strings, numbers, booleans, and date cells stored as
  * Excel serial numbers.
  *
  * Driver-side by design: these drops are small per-date files (the
  * reference loads them wholesale into pandas). Large-file ingestion goes
  * through columnar formats, not Excel.
  */
object Xlsx {

  private val factory = XMLInputFactory.newInstance()
  factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
  factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)

  /** Raw sheet contents: header row + data rows, cells as raw strings
    * (numeric cells keep their serial/decimal text). Missing cells are
    * null. */
  def readSheet(path: String, sheetName: String): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(path)
    try {
      val sheets = parseWorkbook(zip)
      val rels = parseRels(zip)
      val target = sheets.get(sheetName)
        .flatMap(rels.get)
        .map(t => if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
        .getOrElse(throw new IllegalArgumentException(
          s"sheet '$sheetName' not found in $path (sheets: ${sheets.keys.mkString(", ")})"))
      val shared = parseSharedStrings(zip)
      val rows = parseWorksheet(zip, target, shared)
      if (rows.isEmpty) (Seq.empty, Seq.empty)
      else {
        val width = rows.map(_.size).max
        val dense = rows.map(r => r.padTo(width, null: String))
        (dense.head, dense.tail)
      }
    } finally zip.close()
  }

  private def entryReader(zip: ZipFile, name: String) = {
    val e = zip.getEntry(name)
    if (e == null) null else factory.createXMLStreamReader(zip.getInputStream(e))
  }

  /** xl/workbook.xml: sheet name → relationship id. */
  private def parseWorkbook(zip: ZipFile): Map[String, String] = {
    val r = entryReader(zip, "xl/workbook.xml")
    require(r != null, "xl/workbook.xml missing — not an xlsx file")
    val out = mutable.LinkedHashMap[String, String]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var name: String = null; var rid: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id" => rid = r.getAttributeValue(i)  // r:id
            case _ =>
          }
        }
        if (name != null && rid != null) out(name) = rid
      }
    }
    r.close(); out.toMap
  }

  /** xl/_rels/workbook.xml.rels: relationship id → part target. */
  private def parseRels(zip: ZipFile): Map[String, String] = {
    val r = entryReader(zip, "xl/_rels/workbook.xml.rels")
    if (r == null) return Map.empty
    val out = mutable.Map[String, String]()
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
        var id: String = null; var target: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "Id" => id = r.getAttributeValue(i)
            case "Target" => target = r.getAttributeValue(i)
            case _ =>
          }
        }
        if (id != null && target != null) out(id) = target
      }
    }
    r.close(); out.toMap
  }

  /** xl/sharedStrings.xml: one concatenated string per <si> (rich-text
    * runs collapse to their text). */
  private def parseSharedStrings(zip: ZipFile): Vector[String] = {
    val r = entryReader(zip, "xl/sharedStrings.xml")
    if (r == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    var depth = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.clear(); depth += 1
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close(); out.result()
  }

  /** Worksheet sheetData: list of rows, each a sparse-by-ref list of cell
    * strings densified by column index. */
  private def parseWorksheet(zip: ZipFile, part: String,
                             shared: Vector[String]): Seq[Seq[String]] = {
    val r = entryReader(zip, part)
    require(r != null, s"worksheet part $part missing")
    val rows = mutable.ArrayBuffer[Seq[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = "n"
    var inV = false
    var inIs = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.ArrayBuffer[String]()
          case "c" =>
            cellType = "n"; cellCol = row.size
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "r" => cellCol = colIndex(r.getAttributeValue(i))
                case "t" => cellType = r.getAttributeValue(i)
                case _ =>
              }
            }
          case "v" => inV = true; text.clear()
          case "is" => inIs = true
          case "t" if inIs => inV = true; text.clear()
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row.toSeq; row = null
          case "c" =>
          case "v" | "t" if inV =>
            inV = false
            val raw = text.toString
            val value = cellType match {
              case "s" => shared.lift(raw.trim.toInt).orNull
              case "b" => if (raw.trim == "1") "true" else "false"
              case _ => raw
            }
            while (row.size <= cellCol) row += null
            row(cellCol) = value
          case "is" => inIs = false
          case _ =>
        }
        case _ =>
      }
    }
    r.close(); rows.toSeq
  }

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  /** Excel serial day 1 = 1900-01-01, with the fictional 1900-02-29
    * (day 60) — the standard epoch adjustment is day 0 = 1899-12-30. */
  private val excelEpoch = LocalDate.of(1899, 12, 30)

  private[graft] def convert(raw: String, dt: DataType): Any = {
    if (raw == null || raw.isEmpty) return null
    dt match {
      case StringType => raw
      case DateType =>
        if (raw.forall(c => c.isDigit || c == '.'))
          java.sql.Date.valueOf(excelEpoch.plusDays(raw.toDouble.toLong))
        else java.sql.Date.valueOf(LocalDate.parse(raw.take(10)))
      case TimestampType =>
        if (raw.forall(c => c.isDigit || c == '.')) {
          val days = raw.toDouble
          val secs = math.round((days - days.floor) * 86400)
          java.sql.Timestamp.valueOf(
            excelEpoch.plusDays(days.floor.toLong).atStartOfDay.plusSeconds(secs))
        } else java.sql.Timestamp.valueOf(raw.replace('T', ' '))
      case d: DecimalType => new java.math.BigDecimal(raw.replace(',', '.'))
        .setScale(d.scale, java.math.RoundingMode.HALF_UP)
      case DoubleType => raw.toDouble
      case IntegerType => raw.toDouble.toInt
      case LongType => raw.toDouble.toLong
      case BooleanType => raw == "true" || raw == "1"
      case other => throw new IllegalArgumentException(s"unsupported xlsx target type $other")
    }
  }

  /** Write a single-sheet xlsx from raw rows (header first). Cell values
    * starting with "#" are written as raw numeric cells ("#44196" = a
    * date serial or any number); others go through sharedStrings — the
    * inverse of [[readSheet]]'s cell handling, and enough for the small
    * per-date tabular drops this format carries (see the class note:
    * large-file interchange goes through columnar formats). Driver-side
    * by design, like [[readSheet]]. */
  def writeSheet(path: String, sheetName: String, rows: Seq[Seq[String]]): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val strings = mutable.LinkedHashMap[String, Int]()
    def sst(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    // escapes both text and attribute context (quotes matter only in the
    // latter, but &quot; is valid in both — one function serves)
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
    // bijective base-26 column name: A..Z, AA..AZ, BA.. (0 → A, 26 → AA)
    def colName(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { n -= 1; sb.insert(0, ('A' + n % 26).toChar); n /= 26 }
      sb.toString
    }

    def cellXml(rowIdx: Int, colIdx: Int, v: String): String = {
      val ref = s"${colName(colIdx)}${rowIdx + 1}"
      if (v == null) ""
      else if (v.startsWith("#")) s"""<c r="$ref"><v>${v.drop(1)}</v></c>"""
      else s"""<c r="$ref" t="s"><v>${sst(v)}</v></c>"""
    }
    val sheetRows = rows.zipWithIndex.map { case (r, i) =>
      s"""<row r="${i + 1}">${r.zipWithIndex.map { case (v, j) =>
        cellXml(i, j, v) }.mkString}</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>"""
    val sstXml =
      s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${strings.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>"""
    val workbookXml =
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val relsXml =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
    // the two package-level parts external consumers (Excel, pandas/
    // openpyxl) require to open the zip as an OOXML package at all:
    // content-type declarations for every part, and the root rel that
    // points at the workbook (ADVICE r6)
    val contentTypesXml =
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""
    val rootRelsXml =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      put("[Content_Types].xml", contentTypesXml)
      put("_rels/.rels", rootRelsXml)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", relsXml)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
    } finally zos.close()
  }
}

/** TabularFileAdapter over the native reader: cells are mapped to the
  * target schema by HEADER NAME (pandas semantics, main.py:98 `header=0`),
  * falling back to position for unnamed columns. */
final class XlsxAdapter(sheetName: String) extends Sources.TabularFileAdapter {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val (header, raw) = Xlsx.readSheet(path, sheetName)
    val positions = schema.fields.zipWithIndex.map { case (f, i) =>
      val byName = header.indexOf(f.name)
      if (byName >= 0) byName else i
    }
    val rows: java.util.List[Row] = raw.map { r =>
      Row(schema.fields.zip(positions).map { case (f, p) =>
        Xlsx.convert(r.lift(p).orNull, f.dataType)
      }.toIndexedSeq: _*)
    }.asJava
    spark.createDataFrame(rows, schema)
  }
}
