package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Builds minimal single-sheet xlsx files from raw OOXML parts for tests.
  * Cell values starting with "#" are written as raw numeric cells
  * (e.g. "#44196" = a date serial); others go through sharedStrings. */
object XlsxTestWriter {
  def writeXlsx(path: String, sheetName: String, rows: Seq[Seq[String]]): Unit = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sst(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def cellXml(rowIdx: Int, colIdx: Int, v: String): String = {
      val ref = s"${('A' + colIdx).toChar}${rowIdx + 1}"
      if (v == null) ""
      else if (v.startsWith("#")) s"""<c r="$ref"><v>${v.drop(1)}</v></c>"""
      else s"""<c r="$ref" t="s"><v>${sst(v)}</v></c>"""
    }
    val sheetRows = rows.zipWithIndex.map { case (r, i) =>
      s"""<row r="${i + 1}">${r.zipWithIndex.map { case (v, j) => cellXml(i, j, v) }.mkString}</row>"""
    }.mkString
    val sheetXml =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>"""
    val sstXml =
      s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${strings.keys.map(s => s"<si><t>$s</t></si>").mkString}</sst>"""
    val workbookXml =
      s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="$sheetName" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val relsXml =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""

    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml", workbookXml)
    put("xl/_rels/workbook.xml.rels", relsXml)
    put("xl/sharedStrings.xml", sstXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zos.close()
  }
}
