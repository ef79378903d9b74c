package graft

/** Test alias for the engine's xlsx writer ([[graft.io.Xlsx.writeSheet]]);
  * kept so fixture-building specs read naturally. */
object XlsxTestWriter {
  def writeXlsx(path: String, sheetName: String, rows: Seq[Seq[String]]): Unit =
    graft.io.Xlsx.writeSheet(path, sheetName, rows)
}
