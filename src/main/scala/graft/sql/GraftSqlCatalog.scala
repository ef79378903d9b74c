package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog => DsV2TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark DSv2 catalog plugin over a [[graft.catalog.TableCatalog]] root
  * (VERDICT r9 next #5): registers the versioned parquet tables with
  * plain SQL, so a SQL-first user reaches them — including TIME TRAVEL —
  * without the Scala API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", classOf[GraftSqlCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.g.root", "/path/to/catalog")
  *   spark.sql("SELECT * FROM g.dim")                  // committed snapshot
  *   spark.sql("SELECT * FROM g.dim VERSION AS OF 3")  // time travel
  * }}}
  *
  * `loadTable` resolves the `_version` pointer (or the `VERSION AS OF`
  * clause) to the immutable snapshot directory and hands Spark its own
  * `ParquetTable` over that path — the scan, pushdown, pruning, and
  * vectorized reader are stock Spark; this plugin contributes only the
  * snapshot resolution, which is the whole point of the layout (the
  * cost of time travel was paid at commit time). Read-only by design:
  * writes go through the Scala verbs, whose commit protocols (locks,
  * pointer swaps, retention) a blind `INSERT INTO` could not honor.
  * Reads carry BARE-SCAN semantics, exactly like `TableCatalog.read` —
  * a table with live deletion vectors is refused loudly rather than
  * silently resurrecting deleted rows (fold first; the auto-fold
  * threshold keeps vectors transient). */
class GraftSqlCatalog extends DsV2TableCatalog {

  private var catalogName: String = _
  private var cat: graft.catalog.TableCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val root = options.get("root")
    require(root != null && root.nonEmpty,
      s"set spark.sql.catalog.$name.root to a graft catalog root directory")
    cat = new graft.catalog.TableCatalog(SparkSession.active, root)
  }

  override def name(): String = catalogName

  // tables live flat under the root — one namespace, the empty one
  override def defaultNamespace(): Array[String] = Array.empty

  private def tableOf(ident: Identifier): String = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident)
    ident.name()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val root = Paths.get(cat.root)
    if (!Files.exists(root)) return Array.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => Identifier.of(Array.empty, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && cat.exists(ident.name())

  override def loadTable(ident: Identifier): Table =
    parquetTable(ident, None)

  /** `VERSION AS OF <v>` — resolve the immutable `_v<v>` snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new NoSuchTableException(ident)
    }
    parquetTable(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds since epoch;
    * the commit-history log resolves it to the latest version committed
    * at that instant (refused before the first logged commit — serving
    * the current snapshot for a pre-history probe would silently lie
    * about what existed then). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = tableOf(ident)
    if (!cat.exists(t)) throw new NoSuchTableException(ident)
    val v = cat.versionAtTimestamp(t, timestamp / 1000L).getOrElse(
      throw new NoSuchTableException(ident))
    parquetTable(ident, Some(v))
  }

  private def parquetTable(ident: Identifier, version: Option[Long]): Table = {
    val t = tableOf(ident)
    if (!cat.exists(t)) throw new NoSuchTableException(ident)
    require(!cat.hasDeleteVectors(t),
      s"'$t' carries live deletion vectors — SQL reads are bare scans; " +
        "applyDeleteVectors (or let the auto-fold threshold run) first")
    val dir = version match {
      case Some(v) =>
        // resolve against the COMMITTED pointer, not bare existence: a
        // writer that crashed mid `_v<next>` write leaves a partial,
        // uncommitted directory on disk (vacuum reclaims it after the
        // grace window) — serving it would silently return partial
        // rows. Only v <= currentVersion is ever a committed snapshot.
        val committed = cat.currentVersion(t).exists(v <= _)
        val d = Paths.get(cat.path(t), s"_v$v")
        if (!committed || !Files.exists(d)) throw new NoSuchTableException(ident)
        d.toString
      case None =>
        cat.currentVersion(t) match {
          case Some(v) => Paths.get(cat.path(t), s"_v$v").toString
          case None => cat.path(t) // plain append-style table
        }
    }
    // an evolved table reads under its DECLARED schema (the catalog's
    // schema log) — footer inference over a mixed-schema snapshot
    // would sample one file's shape
    val declared = version.orElse(cat.currentVersion(t))
      .flatMap(v => cat.resolveSchema(t, v))
    // the stock ParquetTable is WRITABLE (FileTable extends
    // SupportsWrite), and an INSERT would mutate an immutable snapshot
    // directory behind the version pointer — wrap it read-only so DML
    // fails at ANALYSIS with a capability error, not silently on disk
    new GraftSqlCatalog.ReadOnlyTable(ParquetTable(s"$catalogName.$t",
      SparkSession.active, CaseInsensitiveStringMap.empty(), Seq(dir),
      declared, classOf[ParquetFileFormat]))
  }

  private def readOnly(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only: $verb goes through the graft Scala API, " +
        "whose commit protocols (writer lease, pointer swap, retention) " +
        "SQL DDL cannot honor")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("ALTER TABLE RENAME")
}

object GraftSqlCatalog {
  /** A BATCH_READ-only view of a ParquetTable: scans delegate, write
    * capabilities are simply not advertised, so `INSERT INTO` fails in
    * analysis ("table does not support append") instead of writing
    * plain files into an immutable `_vN` snapshot directory. */
  private final class ReadOnlyTable(delegate: ParquetTable)
      extends Table with SupportsRead {
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): java.util.Map[String, String] =
      delegate.properties()
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      delegate.newScanBuilder(options)
  }
}
