package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** S9 — file archiver (reference main.py:20-30): after a date's files are
  * loaded, move every file whose name carries that `DDMMYYYY` date to
  * `<dir>/archive/<name>.backup`. The reference assumes `archive/` exists;
  * we create it defensively (SURVEY §2.1 S9). Driver-side I/O — at cluster
  * scale this becomes a Hadoop FileSystem.rename against the object store.
  */
object Archiver {
  private val datePattern = raw"(\d{8})".r.unanchored

  def filesToArchive(dir: String, date: String): Unit = {
    val root = Paths.get(dir)
    val archive = root.resolve("archive")
    Files.createDirectories(archive)
    val stream = Files.list(root)
    val matched =
      try stream.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter { p =>
          p.getFileName.toString match {
            case datePattern(d) => d == date
            case _ => false
          }
        }
        .toSeq
      finally stream.close()
    matched
      .foreach { p =>
        Files.move(p, archive.resolve(p.getFileName.toString + ".backup"),
          StandardCopyOption.REPLACE_EXISTING)
      }
  }
}
