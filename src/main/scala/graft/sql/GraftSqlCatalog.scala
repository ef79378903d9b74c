package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDeleteV2, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog => DsV2TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
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
  * cost of time travel was paid at commit time). Reads carry BARE-SCAN
  * semantics, exactly like `TableCatalog.read` — a table with live
  * deletion vectors is refused loudly rather than silently resurrecting
  * deleted rows (fold first; the auto-fold threshold keeps vectors
  * transient).
  *
  * DML writes THROUGH the commit protocols (r10): `INSERT INTO g.t`
  * and `INSERT OVERWRITE g.t` resolve to [[graft.catalog.TableCatalog
  * .appendAtomic]] / `replaceAtomic` via a DSv2 `V1Write` — the write
  * takes the table's writer lock, lands a hard-link snapshot, stamps
  * the history log, and feeds the change feed, identical to the Scala
  * verb (because it IS the Scala verb; a raw parquet INSERT into the
  * snapshot directory is exactly what this catalog exists to prevent).
  * `CREATE TABLE` / CTAS commit an empty v1 and append into it. Time
  * travel stays read-only — there is no INSERT into the past — and
  * schema drift on INSERT is refused by appendAtomic's evolution gate
  * (SQL users evolve via the Scala `mergeSchema` opt-in, an explicit
  * act). */
class GraftSqlCatalog extends DsV2TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var cat: graft.catalog.TableCatalog = _

  /** The underlying engine catalog — the seam [[GraftSqlParser]]'s
    * PARTITION FIELD command resolves its verbs through. */
  private[sql] def tableCatalog: graft.catalog.TableCatalog = cat

  /** The SQL maintenance surface (VERDICT r10 next #6): the catalog's
    * audit and maintenance verbs as stored procedures —
    * `CALL g.system.describe_history('t')`, `optimize`, `vacuum`,
    * `restore` — so a SQL-first operator runs the whole table lifecycle
    * without the Scala API. Each procedure is a thin binding onto the
    * corresponding catalog verb; results come back as rows. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftSqlCatalog.ProcedureNames
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(Array("system")) ||
        !GraftSqlCatalog.ProcedureNames.contains(ident.name()))
      throw new RuntimeException(
        s"no procedure $catalogName.${ident.namespace().mkString(".")}" +
          s".${ident.name()} — available: " +
          GraftSqlCatalog.ProcedureNames.map(n => s"$catalogName.system.$n")
            .mkString(", "))
    new GraftSqlCatalog.GraftProcedure(ident.name(), cat)
  }

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
    namespace match {
      case Array(GenNs(g)) =>
        return (try cat.catalogPins(g.toLong)
          catch { case _: IllegalArgumentException =>
            throw new NoSuchNamespaceException(namespace) })
          .keys.toSeq.sorted
          .map(t => Identifier.of(namespace, t)).toArray
      case _ => ()
    }
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

  // `c<N>` namespaces expose CATALOG SNAPSHOTS (multi-table txn
  // generations): `g.c3.fact JOIN g.c3.dim` reads both tables as
  // generation 3 pinned them — cross-table consistency in plain SQL,
  // the query-side of TableCatalog.readConsistentAt. Generation reads
  // are time travel, hence read-only.
  private val GenNs = "c(\\d+)".r

  private def pinnedVersion(ident: Identifier): Option[Long] =
    ident.namespace() match {
      case Array(GenNs(g)) =>
        val pins =
          try cat.catalogPins(g.toLong)
          catch { case _: IllegalArgumentException =>
            throw new NoSuchTableException(ident) }
        Some(pins.getOrElse(ident.name(),
          throw new NoSuchTableException(ident)))
      case _ => None
    }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace() match {
      case Array(GenNs(g)) =>
        (try cat.catalogPins(g.toLong).contains(ident.name())
         catch { case _: IllegalArgumentException => false })
      case _ => ident.namespace().isEmpty && cat.exists(ident.name())
    }

  override def loadTable(ident: Identifier): Table = {
    // `t@branch` — the write-audit-publish surface from SQL, both
    // halves: SELECT serves the would-be table state (base ∪ staged,
    // or the staged rewrite alone) so an auditor runs any query
    // against the branch, and INSERT INTO / INSERT OVERWRITE stage
    // through the catalog's branch verbs (appendToBranch /
    // replaceBranch) — so the whole stage→audit→publish loop runs in
    // plain SQL with `CALL g.system.publish_branch` at the end. Main
    // readers never see any of it.
    val n = ident.name()
    val at = n.indexOf('@')
    if (at > 0) {
      val t = n.take(at)
      val br = n.drop(at + 1)
      if (!cat.exists(t)) throw new NoSuchTableException(ident)
      // the life the statement pins: a row-level commit refuses if the
      // branch flipped lives between this resolution and the commit
      val brEpoch = cat.branchEpochOf(t, br)
      if (cat.partitionSpecVersioned(t)) {
        // PV branch: the read is the union of the base SNAPSHOT tree
        // and the staged leaf tree — one multi-root parquet relation
        // under the declared spec schema (hidden transform columns
        // resolve for discovery, the wrapper's declared schema hides
        // them; identity leaves prune via Spark's own partition
        // pruning). INSERT stages through the pv-aware appendToBranch;
        // OVERWRITE and row-level statements refuse in the catalog
        // (pv branches are append-mode).
        val (pcols, declared) = cat.partitionSpec(t).getOrElse(
          throw new NoSuchTableException(ident))
        val gen = cat.partitionGen(t)
        val full = StructType(declared.fields ++ gen.map(g =>
          org.apache.spark.sql.types.StructField(g.name,
            GraftSqlCatalog.genType(g), nullable = true)))
        val paths = cat.branchReadPathsPv(t, br).orElse(
          // un-created branch: WRITE-only resolution (reads refuse at
          // scan time via the unborn-branch check)
          cat.currentVersion(t).map(v =>
            Seq(cat.snapshotPath(t, v).toString)))
          .getOrElse(throw new NoSuchTableException(ident))
        // the delegate gets ONE root only as a schema/name anchor —
        // scans run through the per-root composite (branchRoots), and
        // partitioning() answers from partCols, so the delegate's
        // multi-root discovery (which refuses sibling roots) never runs
        return new GraftSqlCatalog.VersionedTable(
          ParquetTable(s"$catalogName.$n", SparkSession.active,
            CaseInsensitiveStringMap.empty(), paths.take(1), Some(full),
            classOf[ParquetFileFormat]), cat, t,
          writable = true, loadedVersion = cat.currentVersion(t),
          branch = Some(br), branchEpoch = brEpoch,
          partCols = Some(pcols), genSpec = gen,
          declaredSchema = Some(declared),
          multiGens = cat.specGenerations(t),
          branchRoots = Some(paths),
          branchClaims = cat.branchReplaceClaimsPv(t, br)
            .getOrElse(Seq.empty))
      }
      val parts = cat.branchReadParts(t, br).orElse {
        // an un-created branch resolves for the WRITE half only —
        // serving it makes `INSERT INTO g.`t@branch`` the loop's first
        // statement (the write verb creates the branch), instead of
        // demanding a Scala-side creation before SQL can start
        // staging. READS of it refuse loudly at scan time (ADVICE r12
        // low): silently serving main-table data would let an audit
        // 'pass' against the wrong relation on a typoed branch name.
        cat.currentVersion(t).map(v =>
          (Seq(cat.snapshotPath(t, v).toString),
            cat.resolveSchema(t, v).getOrElse(
              SparkSession.active.read.parquet(
                cat.snapshotPath(t, v).toString).schema)))
      }.getOrElse(throw new NoSuchTableException(ident))
      new GraftSqlCatalog.VersionedTable(ParquetTable(s"$catalogName.$n",
        SparkSession.active, CaseInsensitiveStringMap.empty(), parts._1,
        Some(parts._2), classOf[ParquetFileFormat]), cat, t,
        writable = true, loadedVersion = cat.currentVersion(t),
        branch = Some(br), branchEpoch = brEpoch)
    } else pinnedVersion(ident) match {
      case Some(v) =>
        parquetTable(Identifier.of(Array.empty, ident.name()), Some(v))
      case None => parquetTable(ident, None)
    }
  }

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
    val current = cat.currentVersion(t)
    val dir = version match {
      case Some(v) =>
        // resolve against the COMMITTED pointer, not bare existence: a
        // writer that crashed mid `_v<next>` write leaves a partial,
        // uncommitted directory on disk (vacuum reclaims it after the
        // grace window) — serving it would silently return partial
        // rows. Only v <= currentVersion is ever a committed snapshot.
        val committed = current.exists(v <= _)
        val d = cat.snapshotPath(t, v)
        if (!committed || !Files.exists(d)) throw new NoSuchTableException(ident)
        d.toString
      case None =>
        current match {
          case Some(v) => cat.snapshotPath(t, v).toString
          case None => cat.path(t) // plain append-style table
        }
    }
    // a SQL-created partitioned table reads under its spec's declared
    // schema (works even while empty) and exposes its identity
    // partitioning so EXPLAIN shows partition pruning for what it is.
    // A partitioned VERSIONED table (r13 verdict #1) keeps the spec
    // too — its snapshot dir holds the same Hive leaf tree, so leaf
    // pruning and partition discovery work against `dir` unchanged.
    val pv = cat.partitionSpecVersioned(t)
    val partSpec =
      if (current.isEmpty || pv) cat.partitionSpec(t) else None
    // a lazily-evolved table holds several directory layouts at once
    // (one per spec generation) — reads go through the composite
    // per-generation scan ([[MultiGenScanBuilder]]); INSERT, DELETE,
    // INSERT OVERWRITE and the maintenance procedures route per
    // generation (r16); row-level UPDATE/MERGE pins and replaces
    // leaves per generation too (r18 — pv via the snapshot expect,
    // plain via the pinned-listing protocol)
    // version-pinned loads resolve the generations AS OF that snapshot
    // — a pending generation-compaction intent (crash window) means
    // pre-collapse snapshots still hold the multi-generation layout
    // while the head is already the collapsed one
    val multiGens =
      if (partSpec.isDefined) version match {
        case Some(v) => cat.specGenerationsAt(t, v)
        case None => cat.specGenerations(t)
      } else Seq.empty
    // an evolved table reads under its DECLARED schema (the catalog's
    // schema log) — footer inference over a mixed-schema snapshot
    // would sample one file's shape
    val declared = partSpec.map(_._2).orElse(
      version.orElse(cat.currentVersion(t))
        .flatMap(v => cat.resolveSchema(t, v)))
    // the stock ParquetTable is WRITABLE (FileTable extends
    // SupportsWrite) — but ITS write would drop plain parquet files
    // into an immutable snapshot directory behind the version pointer.
    // Wrap it: scans delegate to stock parquet; the write capability is
    // re-routed through the catalog's own commit verbs, and a
    // time-travel load (version.isDefined) advertises no write at all,
    // so DML against the past fails at ANALYSIS with a capability error
    // a TRANSFORM spec's hidden columns exist only in the directory
    // layout: the delegate resolves them (discovery appends inferred
    // partition columns regardless), the wrapper's schema() hides
    // them, and column pruning keeps them out of every scan
    val gen = if (current.isEmpty || pv) cat.partitionGen(t) else Seq.empty
    val delegateSchema = declared.map { d =>
      if (gen.isEmpty) d
      else StructType(d.fields ++ gen.map(g =>
        org.apache.spark.sql.types.StructField(g.name,
          GraftSqlCatalog.genType(g), nullable = true)))
    }
    new GraftSqlCatalog.VersionedTable(ParquetTable(s"$catalogName.$t",
      SparkSession.active, CaseInsensitiveStringMap.empty(), Seq(dir),
      delegateSchema, classOf[ParquetFileFormat]), cat, t,
      writable = version.isEmpty, loadedVersion = current,
      partCols = partSpec.map(_._1), genSpec = gen,
      partVersioned = pv, scanRoot = Some(dir),
      declaredSchema = partSpec.map(_._2), multiGens = multiGens)
  }

  private def readOnly(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only: $verb goes through the graft Scala API, " +
        "whose commit protocols (writer lease, pointer swap, retention) " +
        "SQL DDL cannot honor")

  /** CREATE TABLE (and the create half of CTAS): commit an EMPTY v1
    * through replaceAtomic, so the table is born versioned — history
    * entry, schema carried by the (single, zero-row) parquet file,
    * ready for INSERT INTO. `PARTITIONED BY (…)` maps to the catalog's
    * Hive-partitioned PLAIN layout instead (the appendPartitioned
    * family: partition-pruned scans, O(changed leaves) deleteWhere) —
    * identity columns nest leaves directly, and the Iceberg transform
    * set (`days/months/years/hours(ts)`, `bucket(n, col)`,
    * `truncate(w, col)`) materializes as HIDDEN generated partition
    * columns whose leaves prune from source-column predicates. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val t = tableOf(ident)
    require(!t.startsWith("_") && !t.startsWith("."),
      s"table name '$t' collides with the catalog's internal namespace " +
        "(write-asides, sidecars) and would be unlistable")
    if (cat.exists(t))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(t))
    if (partitions.nonEmpty) {
      // identity columns AND the Iceberg temporal/bucket transforms
      // (r12 "missing" #3): days/months/years/hours(ts) and
      // bucket(n, col) materialize as HIDDEN generated partition
      // columns — INSERT supplies the declared shape, SELECT never
      // sees them, reads prune leaves from source-column predicates
      val parts = partitions.toSeq.map {
        case p if p.name == "identity" && p.references().length == 1 &&
            p.references()(0).fieldNames().length == 1 =>
          ("identity", p.references()(0).fieldNames()(0), 0)
        case p if Seq("days", "months", "years", "hours").contains(p.name) &&
            p.references().length == 1 &&
            p.references()(0).fieldNames().length == 1 =>
          (p.name, p.references()(0).fieldNames()(0), 0)
        case p if Seq("bucket", "truncate").contains(p.name) &&
            p.references().length == 1 &&
            p.references()(0).fieldNames().length == 1 =>
          val n = p.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
              l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"${p.name} transform needs a literal count/width: $p"))
          (p.name, p.references()(0).fieldNames()(0), n)
        case other => throw new UnsupportedOperationException(
          s"$catalogName supports PARTITIONED BY identity columns and " +
            s"days/months/years/hours/bucket/truncate transforms — got " +
            s"$other; " +
            "cluster versioned tables with optimizeZOrder / " +
            "analyze(skipCols) instead")
      }
      // TBLPROPERTIES ('versioned'='true') opts a partitioned table
      // into the SNAPSHOT layout (r13 verdict #1): leaf-pruned scans
      // plus time travel / history / O(delta) CDC on one table
      val versioned = Seq("versioned", "graft.versioned").exists(k =>
        Option(properties.get(k)).exists(_.equalsIgnoreCase("true")))
      if (versioned) cat.createPartitionedVersioned(t, schema, parts)
      else if (parts.forall(_._1 == "identity"))
        cat.createPartitioned(t, schema, parts.map(_._2))
      else cat.createPartitionedTransformed(t, schema, parts)
      return loadTable(ident)
    }
    val spark = SparkSession.active
    // repartition(1) forces ONE zero-row part file, so the snapshot
    // carries the declared schema in a parquet footer — an empty dir
    // would fail schema inference on the first read
    cat.replaceAtomic(t, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .repartition(1))
    loadTable(ident)
  }

  /** ALTER TABLE schema evolution through the catalog's own
    * machinery. ADD COLUMN: a zero-row `appendAtomic(mergeSchema)`
    * commits a new version whose declared (schema-log) shape is the
    * union, no data rewritten — old files null-fill the new column on
    * read, time travel keeps the shape each version HAD, and the
    * change feed refuses to span the evolution (already its rule).
    * RENAME / DROP COLUMN route to the catalog's metadata-only
    * column-mapping verbs (field-id matching keeps existing bytes
    * readable), and ALTER COLUMN TYPE routes to the widening verb
    * (int→long, float→double, decimal growth — Spark's parquet
    * up-cast readers serve the old bytes; narrowing refuses). Any
    * other change stays refused — it would change what existing bytes
    * mean. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = tableOf(ident)
    if (!cat.exists(t)) throw new NoSuchTableException(ident)
    val cur = loadTable(ident).schema()
    val adds = changes.map {
      case a: TableChange.AddColumn if a.fieldNames().length > 1 =>
        // nested ADD (r16): a metadata-only schema commit — the struct
        // widens in the declared schema, old files null-fill the new
        // field on read
        require(a.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not supported: evolved fields " +
            "append")
        val parent = a.fieldNames().init.toSeq
        val f = org.apache.spark.sql.types.StructField(
          a.fieldNames().last, a.dataType(), nullable = true)
        require(a.isNullable,
          s"ADD COLUMN ${a.fieldNames().mkString(".")} NOT NULL is " +
            "impossible here: existing rows null-fill the new field")
        if (cat.partitionSpec(t).isDefined)
          cat.addNestedColumnPartitioned(t, parent, f)
        else cat.addNestedColumn(t, parent, f)
        return loadTable(ident)
      case r: TableChange.RenameColumn if r.fieldNames().length > 1 =>
        // nested RENAME (r16): metadata-only via nested column mapping
        // — requires files provably id-stamped at struct depth (the
        // verb's own gate explains the one-time rewrite otherwise)
        cat.renameColumnPath(t, r.fieldNames().toSeq, r.newName())
        return loadTable(ident)
      case d: TableChange.DeleteColumn if d.fieldNames().length > 1 =>
        cat.dropColumnPath(t, d.fieldNames().toSeq)
        return loadTable(ident)
      case u: TableChange.UpdateColumnType if u.fieldNames().length > 1 =>
        // nested widening is name-based (the up-cast happens at the
        // parquet leaf) — no id precondition
        cat.widenColumnPath(t, u.fieldNames().toSeq, u.newDataType())
        return loadTable(ident)
      case a: TableChange.AddColumn =>
        val n = a.fieldNames()(0)
        require(!cur.fieldNames.contains(n),
          s"column '$n' already exists in '$t'")
        // old rows null-fill the new column, so NOT NULL is
        // unsatisfiable by construction — refuse loudly rather than
        // silently downgrading the declared invariant (review r10);
        // same for a position: the union schema appends
        require(a.isNullable,
          s"ADD COLUMN $n NOT NULL is impossible here: existing rows " +
            "null-fill the new column (add nullable, backfill, then " +
            "enforce via addConstraint)")
        require(a.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not supported: evolved columns append")
        org.apache.spark.sql.types.StructField(n, a.dataType(),
          nullable = true)
      case r: TableChange.RenameColumn =>
        // metadata-only through the catalog's column-mapping verb
        cat.renameColumn(t, r.fieldNames()(0), r.newName())
        return loadTable(ident)
      case d: TableChange.DeleteColumn =>
        cat.dropColumn(t, d.fieldNames()(0))
        return loadTable(ident)
      case u: TableChange.UpdateColumnType =>
        // metadata-only type WIDENING (r12 verdict #4); non-widening
        // changes refuse inside the verb
        cat.widenColumn(t, u.fieldNames()(0), u.newDataType())
        return loadTable(ident)
      case other =>
        readOnly(s"ALTER TABLE ${other.getClass.getSimpleName}")
    }
    require(adds.map(_.name).distinct.size == adds.size,
      "duplicate column in ADD COLUMNS")
    if (cat.partitionSpec(t).isDefined) {
      // partitioned PLAIN table: schema lives in the spec sidecar —
      // one metadata write; the snapshot-append route below would
      // plant a _v1 pointer inside the Hive layout and SQL reads
      // would silently serve the empty snapshot instead of the data
      cat.addColumnsPartitioned(t, adds)
      return loadTable(ident)
    }
    val spark = SparkSession.active
    cat.appendAtomic(t, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(adds.toArray)).repartition(1), mergeSchema = true)
    loadTable(ident)
  }

  /** DROP TABLE — also Spark's cleanup hook when a non-atomic CTAS
    * write fails after [[createTable]] committed the empty v1: refusing
    * here would mask the original write error behind an
    * UnsupportedOperationException AND strand the half-born table. */
  override def dropTable(ident: Identifier): Boolean =
    cat.dropTable(tableOf(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("ALTER TABLE RENAME")
}

object GraftSqlCatalog {
  private[sql] val ProcedureNames =
    Seq("describe_history", "optimize", "vacuum", "restore",
      "audit_branch", "publish_branch", "drop_branch", "expire_branches",
      "clone", "describe_detail", "restore_timestamp", "analyze",
      "delete_vectorize", "apply_delete_vectors",
      "optimize_zorder", "add_constraint", "drop_constraint",
      "repartition", "fsck", "fsck_all", "quarantine", "unquarantine")

  /** The generated partition column's declared type per transform. */
  private[sql] def genType(g: graft.catalog.TableCatalog.GenCol)
      : org.apache.spark.sql.types.DataType =
    graft.catalog.TableCatalog.genDataType(g)

  /** NOT(claimed-tuple ∨ …) as a RESOLVED row-level expression over
    * the DECLARED columns — the base-tree exclusion a REPLACE-mode pv
    * branch read applies to OLDER spec generations (r17 verdict next
    * #1), whose foreign layouts a partition predicate can't address:
    * identity claim columns compare directly, transform claim columns
    * re-derive from their declared source column
    * ([[graft.catalog.TableCatalog.genExpr]], a pure function), so the
    * match is exact PER ROW. 3VL: a NULL derivation keeps the row
    * (claims name rendered values; only a definite match excises).
    * Resolution runs through the analyzer against an empty relation of
    * the declared schema, so the returned expression is bindable by
    * name to any leg whose output carries the referenced columns. */
  private[sql] def claimsRowExclusionExpr(pcols: Seq[String],
      gen: Seq[graft.catalog.TableCatalog.GenCol],
      declared: StructType, claims: Seq[Seq[Option[String]]])
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    if (claims.isEmpty) return None
    // ONE shared derivation with the native readBranch exclusion and
    // the publish-time survivor rewrite — the three excision sites
    // must agree on every row (r17 review)
    val pcs = graft.catalog.TableCatalog.curSpecPcsFor(pcols, gen,
      n => declared(n).dataType)
    val claimed = claims.map(t =>
      graft.catalog.TableCatalog.tupleMatchExpr(pcs, t)).reduce(_ || _)
    val df = SparkSession.active.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      declared).filter(not(coalesce(claimed, lit(false))))
    df.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
  }

  /** NOT(claimed-tuple ∨ …) as a catalyst expression over a spec's
    * partition columns — the base-tree exclusion of a REPLACE-mode pv
    * branch read, for the leg whose layout IS the claim spec (the
    * CURRENT generation). Every referenced column is a partition
    * column of that leg, so the inner file scan consumes this as a
    * pure partition filter: exact plan-time directory pruning, never a
    * row-group heuristic. Older generations take the row-level
    * [[claimsRowExclusionExpr]] instead. */
  private[sql] def claimsExclusionExpr(pcols: Seq[String],
      gen: Seq[graft.catalog.TableCatalog.GenCol],
      declared: StructType, claims: Seq[Seq[Option[String]]])
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions._
    if (claims.isEmpty) return None
    val tz = Some(SparkSession.active.sessionState.conf
      .sessionLocalTimeZone)
    def attrOf(c: String): AttributeReference = {
      val dt = gen.find(_.name == c).map(genType)
        .getOrElse(declared(c).dataType)
      AttributeReference(c, dt, nullable = true)()
    }
    val one = claims.map { t =>
      pcols.zip(t).map { case (c, v) =>
        val a = attrOf(c)
        v match {
          case Some(x) if a.dataType ==
              org.apache.spark.sql.types.StringType =>
            EqualTo(a, Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString(x), a.dataType)): Expression
          case Some(x) =>
            EqualTo(a, Cast(Literal(x), a.dataType, tz)): Expression
          case None => IsNull(a): Expression
        }
      }.reduce[Expression](And(_, _))
    }.reduce[Expression](Or(_, _))
    Some(Not(one))
  }

  /** Scan builder for HIDDEN (transform) partitioning: leaf-prunes the
    * served paths from pushed predicates on the SOURCE column — the
    * Iceberg read contract, re-expressed as path selection over the
    * Hive layout. Every predicate is returned to Spark un-consumed
    * (row-level filters always apply), so pruning is a pure
    * optimization that can never change results: an unparseable dir, a
    * non-derivable predicate shape, or an OR simply serves more
    * leaves. Identity partition columns keep Spark's own partition
    * pruning (the stock V2 parquet scan splits partition filters
    * natively); only the generated columns need the inversion here.
    * Column pruning forwards to the inner parquet builder, which is
    * what keeps the hidden columns out of the scan output. */
  private final class GenPruneScanBuilder(
      cat: graft.catalog.TableCatalog, table: String,
      fullSchema: StructType, partCols: Seq[String],
      gen: Seq[graft.catalog.TableCatalog.GenCol],
      options: CaseInsensitiveStringMap,
      root: String)
      extends ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    private var preds: Array[Predicate] = Array.empty
    private var required: Option[StructType] = None
    override def pushPredicates(predicates: Array[Predicate])
        : Array[Predicate] = { preds = predicates; predicates }
    override def pushedPredicates(): Array[Predicate] = Array.empty
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = Some(requiredSchema)
    override def build(): org.apache.spark.sql.connector.read.Scan = {
      val paths = GenPrune.leafPaths(root, partCols, gen,
        fullSchema, preds)
      val opts = new java.util.HashMap[String, String](options)
      opts.put("basePath", root)
      val csm = new CaseInsensitiveStringMap(opts)
      val b = ParquetTable(s"$table-genscan", SparkSession.active, csm,
        paths, Some(fullSchema), classOf[ParquetFileFormat])
        .newScanBuilder(csm)
      b match {
        case f: org.apache.spark.sql.connector.read.SupportsPushDownV2Filters =>
          f.pushPredicates(preds); ()
        case _ => ()
      }
      (b, required) match {
        case (pr: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns,
            Some(r)) => pr.pruneColumns(r)
        case _ => ()
      }
      b.build()
    }
  }

  /** The predicate→leaf inversion for generated partition columns. */
  private[sql] object GenPrune {
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => V2Literal}
    import graft.catalog.TableCatalog.GenCol

    /** One derivable conjunct: column, op (`=`, `<`, `<=`, `>`, `>=`,
      * `in`), and its literal value(s) with types — `in` carries the
      * whole list, scalar ops exactly one. */
    type Cmp = (String, String, Seq[(Any, org.apache.spark.sql.types.DataType)])

    /** Flatten the pushed conjunction (top-level array + nested ANDs)
      * into derivable [[Cmp]]s; other shapes contribute nothing. */
    def comparisons(preds: Array[Predicate]): Seq[Cmp] =
      preds.toSeq.flatMap { p =>
        p.name() match {
          case "AND" => comparisons(p.children().collect {
            case c: Predicate => c })
          case op @ ("=" | "<" | "<=" | ">" | ">=") =>
            p.children() match {
              case Array(f: NamedReference, l: V2Literal[_])
                if f.fieldNames().length == 1 =>
                Seq((f.fieldNames()(0), op, Seq((l.value(), l.dataType()))))
              case Array(l: V2Literal[_], f: NamedReference)
                if f.fieldNames().length == 1 =>
                val flipped = op match {
                  case "<" => ">"; case "<=" => ">="
                  case ">" => "<"; case ">=" => "<="; case o => o
                }
                Seq((f.fieldNames()(0), flipped,
                  Seq((l.value(), l.dataType()))))
              case _ => Seq.empty
            }
          case "IN" =>
            p.children() match {
              case arr if arr.length >= 2 => arr(0) match {
                case f: NamedReference if f.fieldNames().length == 1 &&
                    arr.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
                  Seq((f.fieldNames()(0), "in", arr.tail.toSeq.map { l =>
                    val v = l.asInstanceOf[V2Literal[_]]
                    (v.value(), v.dataType())
                  }))
                case _ => Seq.empty
              }
              case _ => Seq.empty
            }
          case _ => Seq.empty
        }
      }

    /** The transform of a LITERAL source value, as a Long ordinal the
      * directory values compare against (epoch-day for `days`, the int
      * itself otherwise). None = not derivable → no pruning. */
    private def genOrdinal(g: GenCol, value: Any,
        dt: org.apache.spark.sql.types.DataType): Option[Long] = {
      import org.apache.spark.sql.types.{DateType, TimestampType}
      // temporal ordinals derive in UTC — exactly the write side's
      // genExpr arithmetic (Iceberg's transform definition), never the
      // CURRENT session TZ, which can differ from the writer's (ADVICE
      // r13 medium #1). A legacy spec (tv=1) wrote session-TZ-derived
      // directories that nothing can re-derive soundly → None, i.e.
      // every leaf kept for temporal predicates. DATE literals carry
      // no timezone and stay derivable under both versions.
      def days: Option[Long] = dt match {
        case DateType => Some(value.asInstanceOf[Int].toLong)
        case TimestampType if g.tv >= 2 =>
          Some(Math.floorDiv(value.asInstanceOf[Long], 86400000000L))
        case _ => None
      }
      g.kind match {
        case "days" => days
        case "months" => days.map { d =>
          val ld = java.time.LocalDate.ofEpochDay(d)
          ld.getYear.toLong * 100L + ld.getMonthValue.toLong
        }
        case "years" =>
          days.map(d => java.time.LocalDate.ofEpochDay(d).getYear.toLong)
        case "hours" => dt match {
          // the same floor-div on micros genExpr materializes; a
          // legacy (tv=1) spec's dirs came from a truncating double
          // division that can disagree with floorDiv → not derivable
          case TimestampType if g.tv >= 2 =>
            Some(Math.floorDiv(value.asInstanceOf[Long], 3600000000L))
          case _ => None
        }
        case "bucket" =>
          // Spark's hash() = Murmur3 seed 42, evaluated on the literal
          try {
            val h = new org.apache.spark.sql.catalyst.expressions
              .Murmur3Hash(Seq(org.apache.spark.sql.catalyst.expressions
                .Literal.create(value, dt)))
              .eval(null).asInstanceOf[Int]
            Some((((h % g.n) + g.n) % g.n).toLong)
          } catch { case _: Exception => None }
        case "truncate" =>
          // numeric flavors only — the string flavor derives its own
          // prefix tests in keepFns. The decimal flavor's ordinal is
          // the UNSCALED value floored to a multiple of the width
          // (rescaled to the SOURCE scale first — a literal at a
          // different scale that cannot rescale exactly is not
          // derivable, which only ever keeps more leaves)
          import org.apache.spark.sql.types._
          (dt, value) match {
            case (ByteType | ShortType | IntegerType | LongType, n: Number)
                if g.dscale < 0 =>
              val w = graft.catalog.TableCatalog.truncWidth(g).toLong
              Some(Math.floorDiv(n.longValue(), w) * w)
            case (_: DecimalType, d: org.apache.spark.sql.types.Decimal)
                if g.dscale >= 0 =>
              try {
                val u = d.toJavaBigDecimal.setScale(g.dscale)
                  .unscaledValue().longValueExact()
                val w = graft.catalog.TableCatalog.truncWidth(g).toLong
                Some(Math.floorDiv(u, w) * w)
              } catch { case _: ArithmeticException => None }
            case _ => None
          }
        case _ => None
      }
    }

    /** Per-gen-column keep test over the UNESCAPED directory (or
      * tuple-string) value, from the pushed comparisons: equality and
      * IN pin to value sets, inequalities bound (strict ops weaken to
      * inclusive — every transform here is monotone, not injective).
      * Bucket derives from equality/IN only. An IN list with ANY
      * non-derivable member contributes nothing (dropping just that
      * member would wrongly prune its leaves). The string-truncate
      * flavor compares prefixes directly; its BOUNDS apply only when
      * both sides are pure ASCII (Scala's UTF-16 ordering and Spark's
      * UTF-8 binary ordering agree there and can diverge beyond). */
    def keepFns(gen: Seq[GenCol], cmps: Seq[Cmp])
        : Map[String, String => Boolean] =
      gen.flatMap { g =>
        val strFlavor = g.kind == "truncate" &&
          graft.catalog.TableCatalog.truncIsString(g)
        def ascii(s: String): Boolean = s.forall(_ < 128)
        val tests: Seq[String => Boolean] =
          cmps.filter(_._1 == g.src).flatMap { case (_, op, vals) =>
            if (g.kind == "bucket" && op != "=" && op != "in") None
            else if (strFlavor) {
              val w = graft.catalog.TableCatalog.truncWidth(g)
              val ts = vals.map { case (v, dt) =>
                if (dt == org.apache.spark.sql.types.StringType &&
                    v != null) Some(v.toString.take(w)) else None }
              if (ts.exists(_.isEmpty)) None
              else {
                val set = ts.flatten
                op match {
                  case "=" | "in" =>
                    Some((raw: String) => set.contains(raw))
                  case ">" | ">=" if set.forall(ascii) =>
                    Some((raw: String) => !ascii(raw) || raw >= set.head)
                  case "<" | "<=" if set.forall(ascii) =>
                    Some((raw: String) => !ascii(raw) || raw <= set.head)
                  case _ => None
                }
              }
            } else {
              val ords = vals.map { case (v, dt) => genOrdinal(g, v, dt) }
              if (ords.exists(_.isEmpty)) None
              else {
                val set = ords.flatten.toSet
                val test: Long => Boolean = op match {
                  case "=" | "in" => set.contains(_)
                  case ">" | ">=" => _ >= set.head
                  case "<" | "<=" => _ <= set.head
                  case _ => _ => true
                }
                Some((raw: String) => parseDirValue(g, raw).forall(test))
              }
            }
          }
        if (tests.isEmpty) None
        else Some(g.name -> ((raw: String) => tests.forall(_(raw))))
      }.toMap

    /** A generated column's UNESCAPED directory (or tuple-string)
      * value as the Long ordinal the numeric tests compare — `days`
      * dirs render as ISO dates, everything else as ints. None =
      * unparseable → the caller must keep (pruning only ever
      * narrows). */
    def parseDirValue(g: GenCol, raw: String): Option[Long] =
      try {
        if (g.kind == "days")
          Some(java.time.LocalDate.parse(raw).toEpochDay)
        else if (g.kind == "truncate" && g.dscale >= 0)
          // decimal flavor renders at the source scale ("12.30") —
          // its ordinal is the unscaled long, same units as genOrdinal
          Some(new java.math.BigDecimal(raw).setScale(g.dscale)
            .unscaledValue().longValueExact())
        else Some(raw.toLong)
      } catch { case _: Exception => None }

    /** Walk the partition directory tree, keeping only leaves whose
      * generated-column values satisfy the derived bounds. Identity
      * levels (and unconstrained gen levels) pass through; anything
      * unparseable is kept — pruning must only ever narrow. A fully
      * pruned-out table serves one provably-empty leaf path set: the
      * base path with no matching leaves still returns zero rows
      * through the row filters, so correctness is Spark's either way. */
    def leafPaths(rootDir: String,
        partCols: Seq[String], gen: Seq[GenCol], fullSchema: StructType,
        preds: Array[Predicate]): Seq[String] = {
      val root = Paths.get(rootDir)
      val keeps = keepFns(gen, comparisons(preds))
      if (keeps.isEmpty || partCols.isEmpty || !Files.exists(root))
        return Seq(rootDir)
      val byName = gen.map(g => g.name -> g).toMap
      def walk(dir: java.nio.file.Path, level: Int): Seq[java.nio.file.Path] =
        if (level == partCols.size) Seq(dir)
        else {
          val colName = partCols(level)
          val stream = Files.list(dir)
          val subs = try {
            import scala.jdk.CollectionConverters._
            stream.iterator().asScala.filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.startsWith(colName + "=")).toSeq
          } finally stream.close()
          subs.filter { p =>
            (byName.get(colName), keeps.get(colName)) match {
              case (Some(_), Some(keep)) =>
                val raw = p.getFileName.toString.drop(colName.length + 1)
                if (raw == org.apache.spark.sql.catalyst.catalog
                    .ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
                  false // src cmp literal is null-rejecting
                else keep(org.apache.spark.sql.catalyst.catalog
                  .ExternalCatalogUtils.unescapePathName(raw))
              case _ => true
            }
          }.flatMap(walk(_, level + 1))
        }
      val leaves = walk(root, 0)
      if (leaves.isEmpty) Seq.empty else leaves.map(_.toString)
    }
  }

  /** One maintenance procedure, bound to its catalog verb. Results are
    * small driver-side row sets (history entries, vacuum audit lines,
    * the committed version) returned through a DSv2 [[LocalScan]] —
    * the verbs themselves do their heavy work distributed. */
  private[sql] final class GraftProcedure(proc: String,
      cat: graft.catalog.TableCatalog)
      extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure {
    import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}
    import org.apache.spark.sql.types.{DataTypes => DT}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String

    override def name(): String = proc
    override def description(): String = proc match {
      case "describe_history" => "commit history of a versioned table"
      case "optimize" =>
        "compact small files (staged rewrite; per-leaf on partitioned)"
      case "vacuum" => "sweep crashed-writer residue; returns the audit"
      case "restore" => "commit a retained snapshot as the new version"
      case "audit_branch" => "enforce CHECK constraints over a staged branch"
      case "publish_branch" => "commit a staged branch as one APPEND"
      case "drop_branch" => "abandon a staged branch and its files"
      case "expire_branches" => "drop branches idle past a grace window"
      case "clone" => "zero-copy CLONE of the current snapshot"
      case "describe_detail" => "one-row operational summary (no data scan)"
      case "fsck" =>
        "integrity check: (severity, check, detail) rows; " +
          "repair=true applies the safe healing subset"
      case "fsck_all" =>
        "fsck over every table in the catalog: (table, severity, " +
          "check, detail) rows"
      case "restore_timestamp" => "restore the snapshot as of an instant"
      case "analyze" => "compute stats (rows/NDV/envelopes) for planning"
      case "delete_vectorize" => "O(matches) merge-on-read DELETE (vectors)"
      case "apply_delete_vectors" => "fold live delete vectors into a rewrite"
      case "optimize_zorder" => "Z-order cluster (staged rewrite + re-analyze)"
      case "add_constraint" => "declare a CHECK constraint (judges existing rows)"
      case "drop_constraint" => "retire a CHECK constraint"
      case "repartition" => "evolve a partitioned table's spec (staged rewrite)"
      case "quarantine" =>
        "fence a sick table from ALL writers while investigating " +
          "(reads still serve); every refused write names the reason"
      case "unquarantine" => "lift a quarantine fence"
    }

    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = proc
        override def description(): String = GraftProcedure.this.description()
        override def isDeterministic: Boolean = false // verbs mutate state

        override def parameters(): Array[ProcedureParameter] = proc match {
          case "describe_history" => Array(
            ProcedureParameter.in("table", DT.StringType).build())
          case "optimize" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("target_mb", DT.LongType)
              .defaultValue("128").build())
          case "vacuum" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("grace_ms", DT.LongType)
              .defaultValue("3600000").build())
          case "restore" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("version", DT.LongType).build())
          case "audit_branch" | "publish_branch" | "drop_branch" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("branch", DT.StringType).build())
          case "expire_branches" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("grace_ms", DT.LongType).build())
          case "clone" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("target", DT.StringType).build())
          case "describe_detail" => Array(
            ProcedureParameter.in("table", DT.StringType).build())
          case "fsck" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("repair", DT.BooleanType)
              .defaultValue("false").build())
          case "fsck_all" => Array(
            ProcedureParameter.in("repair", DT.BooleanType)
              .defaultValue("false").build())
          case "restore_timestamp" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("ts_millis", DT.LongType).build())
          case "analyze" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("cols", DT.StringType)
              .defaultValue("''").build(),
            ProcedureParameter.in("skip_cols", DT.StringType)
              .defaultValue("''").build())
          case "delete_vectorize" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("predicate", DT.StringType).build())
          case "apply_delete_vectors" => Array(
            ProcedureParameter.in("table", DT.StringType).build())
          case "optimize_zorder" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("cols", DT.StringType).build())
          case "add_constraint" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("name", DT.StringType).build(),
            ProcedureParameter.in("predicate", DT.StringType).build())
          case "drop_constraint" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("name", DT.StringType).build())
          case "repartition" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("cols", DT.StringType).build())
          case "quarantine" => Array(
            ProcedureParameter.in("table", DT.StringType).build(),
            ProcedureParameter.in("reason", DT.StringType).build())
          case "unquarantine" => Array(
            ProcedureParameter.in("table", DT.StringType).build())
        }

        override def call(input: InternalRow)
            : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
          // every procedure's first parameter is the table EXCEPT the
          // catalog-wide fsck_all (whose first is the repair flag)
          val table =
            if (proc == "fsck_all") ""
            else input.getUTF8String(0).toString
          val (resultSchema, resultRows): (StructType, Seq[InternalRow]) =
            proc match {
            case "describe_history" =>
              val st = StructType.fromDDL(
                "version LONG, ts_millis LONG, op STRING, files LONG, bytes LONG")
              val rs = cat.history(table).orderBy("version").collect().toSeq
                .map(r => InternalRow(r.getLong(0), r.getLong(1),
                  UTF8String.fromString(r.getString(2)), r.getLong(3),
                  r.getLong(4)))
              (st, rs)
            case "optimize" =>
              if (cat.partitionSpec(table).isDefined) {
                // partitioned tables: per-leaf small-file compaction —
                // the VERSIONED flavor commits one dataChange=false
                // snapshot, the plain one swaps leaves in place (flat
                // versioned tables take the staged rewrite below)
                val out =
                  if (cat.partitionSpecVersioned(table))
                    cat.compactPartitionsVersioned(table,
                      targetBytes = input.getLong(1) << 20)
                  else cat.compactPartitions(table,
                    targetBytes = input.getLong(1) << 20)
                (StructType.fromDDL(
                  "leaf STRING, files_before LONG, files_after LONG"),
                  out.map { case (l, b, a) =>
                    InternalRow(UTF8String.fromString(l), b.toLong,
                      a.toLong) })
              } else {
                val n = cat.compactSmallFiles(table,
                  targetBytes = input.getLong(1) << 20)
                (StructType.fromDDL("files_after LONG"),
                  Seq(InternalRow(n.toLong)))
              }
            case "vacuum" =>
              val audit = cat.vacuum(table, graceMs = input.getLong(1))
              (StructType.fromDDL("category STRING, files LONG, bytes LONG"),
                audit.map { case (c, f, b) =>
                  InternalRow(UTF8String.fromString(c), f, b) })
            case "restore" =>
              val v = cat.restore(table, input.getLong(1))
              (StructType.fromDDL("restored_as LONG"), Seq(InternalRow(v)))
            case "audit_branch" =>
              val n = cat.auditBranch(table, input.getUTF8String(1).toString)
              (StructType.fromDDL("would_be_rows LONG"), Seq(InternalRow(n)))
            case "publish_branch" =>
              val v = cat.publishBranch(table, input.getUTF8String(1).toString)
              (StructType.fromDDL("published_as LONG"), Seq(InternalRow(v)))
            case "drop_branch" =>
              cat.dropBranch(table, input.getUTF8String(1).toString)
              (StructType.fromDDL("dropped LONG"), Seq(InternalRow(1L)))
            case "expire_branches" =>
              val dropped = cat.expireBranches(table, input.getLong(1))
              (StructType.fromDDL("branch STRING, age_ms LONG"),
                dropped.map { case (b, age) =>
                  InternalRow(UTF8String.fromString(b), age) })
            case "clone" =>
              val v = cat.cloneTable(table, input.getUTF8String(1).toString)
              (StructType.fromDDL("cloned_as LONG"), Seq(InternalRow(v)))
            case "describe_detail" =>
              val d = cat.detail(table)
              // dml_* — the compaction advisor (r18): row-level
              // statements since the last spec evolution and the bytes
              // their commits rewrote; past `bytes`, CALL
              // system.repartition has already paid for itself
              (StructType.fromDDL("version LONG, rows LONG, files LONG, " +
                "bytes LONG, branches STRING, tags STRING, " +
                "constraints STRING, columns STRING, " +
                "spec_generations STRING, dml_statements LONG, " +
                "dml_rewritten_bytes LONG"),
                Seq(InternalRow(d.version.getOrElse(-1L), d.rows, d.files,
                  d.bytes, UTF8String.fromString(d.branches.mkString(",")),
                  UTF8String.fromString(d.tags.mkString(",")),
                  UTF8String.fromString(d.constraints.mkString(",")),
                  UTF8String.fromString(d.columns.mkString(",")),
                  UTF8String.fromString(d.specGens.mkString(";")),
                  d.dmlStatements, d.dmlRewrittenBytes)))
            case "fsck" =>
              val rep = !input.isNullAt(1) && input.getBoolean(1)
              (StructType.fromDDL(
                "severity STRING, check STRING, detail STRING"),
                cat.fsck(table, repair = rep).map { case (sev, c, d) =>
                  InternalRow(UTF8String.fromString(sev),
                    UTF8String.fromString(c), UTF8String.fromString(d))
                })
            case "fsck_all" =>
              val rep = !input.isNullAt(0) && input.getBoolean(0)
              (StructType.fromDDL("table STRING, severity STRING, " +
                "check STRING, detail STRING"),
                cat.fsckAll(repair = rep).map { case (t2, sev, c, d) =>
                  InternalRow(UTF8String.fromString(t2),
                    UTF8String.fromString(sev),
                    UTF8String.fromString(c), UTF8String.fromString(d))
                })
            case "restore_timestamp" =>
              val v = cat.restoreTimestamp(table, input.getLong(1))
              (StructType.fromDDL("restored_as LONG"), Seq(InternalRow(v)))
            case "delete_vectorize" =>
              // the O(matches) merge-on-read DELETE from SQL — the
              // versioned DELETE FROM rewrites the whole table (1x
              // write amplification, copy-on-write); this is the
              // O(delta) sibling for plain tables, previously
              // Scala-only. The predicate parses through Spark's own
              // expression parser, so it is exactly the WHERE-clause
              // dialect the caller already writes.
              val n = cat.deleteVectorize(table,
                org.apache.spark.sql.functions.expr(
                  input.getUTF8String(1).toString))
              (StructType.fromDDL("rows_deleted LONG"), Seq(InternalRow(n)))
            case "apply_delete_vectors" =>
              val n = cat.applyDeleteVectors(table)
              (StructType.fromDDL("rows_folded_out LONG"),
                Seq(InternalRow(n)))
            case "quarantine" =>
              cat.quarantine(table, input.getUTF8String(1).toString)
              val (since, reason) = cat.quarantineInfo(table).get
              (StructType.fromDDL("since_millis LONG, reason STRING"),
                Seq(InternalRow(since, UTF8String.fromString(reason))))
            case "unquarantine" =>
              val was = cat.unquarantine(table)
              (StructType.fromDDL("was_quarantined BOOLEAN"),
                Seq(InternalRow(was)))
            case "optimize_zorder" =>
              val cols = Option(input.getUTF8String(1)).map(_.toString)
                .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty)
                .toIndexedSeq
              require(cols.nonEmpty, "optimize_zorder needs cols, e.g. 'a,b'")
              val st = cat.optimizeZOrder(table, cols)
              (StructType.fromDDL("rows LONG, files LONG"),
                Seq(InternalRow(st.rows, st.fileCount)))
            case "add_constraint" =>
              cat.addConstraint(table, input.getUTF8String(1).toString,
                input.getUTF8String(2).toString)
              (StructType.fromDDL("added LONG"), Seq(InternalRow(1L)))
            case "drop_constraint" =>
              cat.dropConstraint(table, input.getUTF8String(1).toString)
              (StructType.fromDDL("dropped LONG"), Seq(InternalRow(1L)))
            case "repartition" =>
              // partition-spec evolution (r12 verdict #3): one staged
              // full rewrite into the new leaf layout + a locked swap.
              // The spec string mixes identity columns and transforms:
              // 'region,days(ts)' / 'bucket(8, k)' — the CREATE TABLE
              // PARTITIONED BY grammar, comma-split at depth zero.
              val raw = Option(input.getUTF8String(1)).map(_.toString)
                .getOrElse("")
              val terms = raw.split(",(?![^(]*\\))").map(_.trim)
                .filter(_.nonEmpty).toIndexedSeq
              require(terms.nonEmpty,
                "repartition needs a spec, e.g. 'a,b' or 'a,days(ts)'")
              val fn = "^(\\w+)\\(([^)]*)\\)$".r
              val parts = terms.map {
                case fn(kind @ ("bucket" | "truncate"), args) =>
                  val a = args.split(",").map(_.trim)
                  require(a.length == 2 && a(0).forall(_.isDigit),
                    s"$kind takes (n, col), got $kind($args)")
                  (kind, a(1), a(0).toInt)
                case fn(kind, src) => (kind, src.trim, 0)
                case ident => ("identity", ident, 0)
              }
              cat.repartitionTableTransformed(table, parts)
              (StructType.fromDDL("part_spec STRING"),
                Seq(InternalRow(UTF8String.fromString(terms.mkString(",")))))
            case "analyze" =>
              def list(i: Int): Seq[String] =
                Option(input.getUTF8String(i)).map(_.toString)
                  .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty)
                  .toIndexedSeq
              val st = cat.analyze(table, cols = list(1),
                skipCols = list(2))
              (StructType.fromDDL("rows LONG, files LONG, column STRING, " +
                "ndv LONG"),
                if (st.ndv.isEmpty)
                  Seq(InternalRow(st.rows, st.fileCount,
                    UTF8String.fromString(""), -1L))
                else st.ndv.toSeq.sortBy(_._1).map { case (c, n) =>
                  InternalRow(st.rows, st.fileCount,
                    UTF8String.fromString(c), n) })
          }
          java.util.Collections.singletonList(
            new org.apache.spark.sql.connector.read.LocalScan {
              override def rows(): Array[InternalRow] = resultRows.toArray
              override def readSchema(): StructType = resultSchema
              override def description(): String = s"graft.system.$proc"
            }: org.apache.spark.sql.connector.read.Scan).iterator()
        }
      }
  }

  /** Scans delegate to the stock ParquetTable over the resolved
    * snapshot; writes are re-routed through the catalog's commit verbs
    * via the DSv2 V1Write bridge — `INSERT INTO` → appendAtomic,
    * `INSERT OVERWRITE` (WriteBuilder.truncate) → replaceAtomic — so a
    * SQL write takes the writer lock, hard-links the carried files,
    * logs history, and shows up in the change feed exactly like the
    * Scala verb. A time-travel load (`writable = false`) advertises
    * BATCH_READ only: `INSERT INTO t VERSION AS OF 3` fails in
    * analysis, not on disk. */
  /** DSv2 V2 Predicate → Column for DELETE. We implement the V2 form
    * DIRECTLY (not the V1 `sources.Filter` bridge) because Spark's
    * V2→V1 conversion is the SCAN-pushdown kind: it silently DROPS an
    * untranslatable branch — sound for a scan filter whose residual
    * re-applies, catastrophic for a DELETE, which has no residual
    * (observed: `k % 10 = 0 OR v > 95` arrived as the lone
    * `GreaterThan(v, 95)` — a silent partial delete). Here an
    * untranslatable node makes the WHOLE predicate None and
    * canDeleteWhere refuses in analysis. Semantics are preserved
    * exactly: the translation targets the same engine that parsed the
    * query. */
  private def v2ToColumn(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.connector.expressions.{GeneralScalarExpression, NamedReference}
    import org.apache.spark.sql.functions.{col, lit, not}
    e match {
      case n: NamedReference => Some(col(n.fieldNames().mkString(".")))
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Some(lit(org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(l.dataType)(l.value)))
      case g: GeneralScalarExpression =>
        val ch = g.children().toIndexedSeq.map(v2ToColumn)
        if (ch.exists(_.isEmpty)) return None
        val c = ch.flatten
        (g.name(), c) match {
          case ("=", Seq(a, b)) => Some(a === b)
          case ("<>", Seq(a, b)) => Some(a =!= b)
          case ("<=>", Seq(a, b)) => Some(a <=> b)
          case (">", Seq(a, b)) => Some(a > b)
          case (">=", Seq(a, b)) => Some(a >= b)
          case ("<", Seq(a, b)) => Some(a < b)
          case ("<=", Seq(a, b)) => Some(a <= b)
          case ("AND", Seq(a, b)) => Some(a && b)
          case ("OR", Seq(a, b)) => Some(a || b)
          case ("NOT", Seq(a)) => Some(not(a))
          case ("IS_NULL", Seq(a)) => Some(a.isNull)
          case ("IS_NOT_NULL", Seq(a)) => Some(a.isNotNull)
          case ("IN", a +: rest) if rest.nonEmpty => Some(a.isin(rest: _*))
          case ("+", Seq(a, b)) => Some(a + b)
          case ("-", Seq(a, b)) => Some(a - b)
          case ("-", Seq(a)) => Some(-a)
          case ("*", Seq(a, b)) => Some(a * b)
          case ("/", Seq(a, b)) => Some(a / b)
          case ("%", Seq(a, b)) => Some(a % b)
          case ("ABS", Seq(a)) => Some(org.apache.spark.sql.functions.abs(a))
          case ("STARTS_WITH", Seq(a, b)) => Some(a.startsWith(b))
          case ("ENDS_WITH", Seq(a, b)) => Some(a.endsWith(b))
          case ("CONTAINS", Seq(a, b)) => Some(a.contains(b))
          case ("ALWAYS_TRUE", _) => Some(lit(true))
          case ("ALWAYS_FALSE", _) => Some(lit(false))
          case _ => None
        }
      case _ => None
    }
  }

  private final class VersionedTable(delegate: ParquetTable,
      cat: graft.catalog.TableCatalog, table: String, writable: Boolean,
      loadedVersion: Option[Long], partCols: Option[Seq[String]] = None,
      branch: Option[String] = None, branchEpoch: Option[String] = None,
      genSpec: Seq[graft.catalog.TableCatalog.GenCol] = Seq.empty,
      partVersioned: Boolean = false, scanRoot: Option[String] = None,
      declaredSchema: Option[StructType] = None,
      multiGens: Seq[graft.catalog.TableCatalog.SpecGen] = Seq.empty,
      branchRoots: Option[Seq[String]] = None,
      branchClaims: Seq[Seq[Option[String]]] = Seq.empty)
      extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
      with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
    private val genNames = genSpec.map(_.name).toSet
    override def name(): String = delegate.name
    // HIDDEN partitioning: a transform spec's generated columns exist
    // only in the directory layout — the declared (INSERT/SELECT)
    // schema never shows them, and column pruning keeps them out of
    // every scan (the delegate still resolves them, so tuple routing
    // and discovery agree).
    // The DECLARED column ORDER is authoritative: the FileTable
    // delegate silently reorders a user schema to partition-cols-LAST,
    // and serving that order made positional INSERT bind values to the
    // wrong columns whenever an identity partition column was not
    // declared last (an ADD COLUMN puts every spec in that shape) —
    // scans are name-projected, so presenting the declared order costs
    // nothing and restores the CREATE statement's contract.
    override def schema(): StructType = declaredSchema match {
      case Some(d) => StructType(d.fields.filterNot(f => genNames(f.name)))
      case None =>
        if (genSpec.isEmpty) delegate.schema
        else StructType(delegate.schema.fields.filterNot(f =>
          genNames(f.name)))
    }
    override def partitioning(): Array[Transform] = {
      import org.apache.spark.sql.connector.expressions.Expressions
      partCols.map(_.map { c =>
        genSpec.find(_.name == c) match {
          case Some(g) => (g.kind match {
            case "days" => Expressions.days(g.src)
            case "months" => Expressions.months(g.src)
            case "years" => Expressions.years(g.src)
            case "hours" => Expressions.hours(g.src)
            case "bucket" => Expressions.bucket(g.n, g.src)
            case "truncate" => Expressions.apply("truncate",
              Expressions.literal(graft.catalog.TableCatalog.truncWidth(g)),
              Expressions.column(g.src))
          }): Transform
          case None => Expressions.identity(c): Transform
        }
      }.toArray).getOrElse(delegate.partitioning())
    }
    override def properties(): java.util.Map[String, String] =
      delegate.properties()
    override def capabilities(): java.util.Set[TableCapability] =
      if (writable)
        // BATCH_WRITE backs the row-level (UPDATE / MERGE) ReplaceData
        // write; INSERT keeps its V1 path — physical planning keys off
        // the Write INSTANCE (V1Write vs batch), not the capability set
        java.util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.BATCH_WRITE,
          TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
      else java.util.EnumSet.of(TableCapability.BATCH_READ)

    /** `UPDATE g.t SET …` / `MERGE INTO g.t …` (and the rewrite form of
      * DELETE when the predicate defeats [[canDeleteWhere]]): Spark's
      * group-based row-level path. The statement's replacement rows are
      * staged through the stock parquet `BatchWrite` and committed as
      * one versioned snapshot by [[graft.catalog.TableCatalog
      * .replaceFromStaged]] — writer lock, optimistic version check
      * against the snapshot the statement SCANNED, history entry,
      * change feed, 1× write amplification (files rename into the
      * snapshot, no second copy). Copy-on-write semantics: the whole
      * table rewrites; the O(delta) forms remain the Scala
      * `mergeInto` / `deleteVectorize`. */
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
      require(writable, s"$table: a time-travel relation is read-only")
      // branch row-level DML (r12 verdict #2): the scan serves the
      // branch's WOULD-BE state (the delegate already resolves base ∪
      // staged, or the staged rewrite), the write stages the fixed
      // rows, and the commit flips the branch to a REPLACE-mode life
      // holding them — main untouched until publish_branch. The SQL
      // repair loop closes: stage → audit fails → UPDATE/DELETE/MERGE
      // the branch → audit passes → publish. An unborn branch refuses
      // (there is nothing to fix; INSERT creates it).
      require(branch.isEmpty || branchEpoch.isDefined,
        s"branch '${branch.getOrElse("")}' of '$table' does not exist — " +
          "row-level SQL fixes an EXISTING branch; stage rows with " +
          "INSERT INTO first")
      // a lazily-evolved table (r18 — the last row-level refusal
      // lifted): pv statements pin leaves against the immutable
      // snapshot; PLAIN statements pin each served leaf's file print
      // and expect-check it under the writer lock (the pinned-listing
      // protocol). The multi-generation scan reads each generation's
      // tree directly, so live delete vectors must fold first — the
      // deleteWhereParts multi-gen rule.
      require(multiGens.size <= 1 || partVersioned || !cat.hasDv(table),
        s"'$table' carries live deletion vectors — multi-generation " +
          "DML reads each generation's tree directly; " +
          "applyDeleteVectors first")
      new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
        override def build()
            : org.apache.spark.sql.connector.write.RowLevelOperation =
          new GraftRowLevelOperation(delegate, cat, table, loadedVersion,
            info.command(), partCols,
            branchTarget = branch.map(b => (b, branchEpoch.get)),
            genSpec = genSpec, partVersioned = partVersioned,
            multiGens = multiGens)
      }
    }
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // an UNBORN branch resolves only so INSERT can create it — a
      // READ of it is a typo or a stale audit script and must fail
      // loudly, never silently serve main-table data (ADVICE r12 low)
      require(branch.isEmpty || branchEpoch.isDefined,
        s"branch '${branch.getOrElse("")}' of '$table' does not exist — " +
          "reads of an unborn branch are refused (a typoed name would " +
          "silently audit the main table); INSERT INTO creates it")
      if (branchRoots.isDefined) {
        // a PV branch read: base snapshot tree ∪ staged leaf tree —
        // sibling roots Spark's own multi-root discovery refuses
        // ("conflicting directory structures"), so the union runs
        // through the same per-root composite scan the lazily-evolved
        // tables use. The BASE snapshot root must exist — a base swept
        // out from under an open branch must fail the audit loudly,
        // exactly like the flat parquet read, never silently serve
        // only the staged rows (ADVICE r15 low #4); the staged dir and
        // generation subtrees stay optional (they appear lazily).
        require(java.nio.file.Files.exists(java.nio.file.Paths.get(
          branchRoots.get.head.stripPrefix("file:"))),
          s"base snapshot of branch '${branch.getOrElse("")}' of " +
            s"'$table' is missing (${branchRoots.get.head}) — it was " +
            "swept by retention while the branch was open; drop the " +
            "branch or restore the snapshot")
        // each root is itself a (possibly multi-generation) leaf tree:
        // one leg per (root, spec generation). A REPLACE-mode branch
        // excludes its claimed partitions from the BASE root's legs —
        // on the CURRENT generation (whose layout IS the claim spec)
        // the exclusion is a pure partition predicate, so the inner
        // scan prunes the claimed leaf dirs exactly at plan time; an
        // OLDER generation's matching rows hide inside foreign leaves,
        // so those legs take an exact ROW-level exclusion re-derived
        // from the declared source columns (r17 verdict next #1). The
        // staged root serves the claims' would-be content.
        val gens =
          if (multiGens.nonEmpty) multiGens
          else Seq(graft.catalog.TableCatalog.SpecGen(
            partCols.getOrElse(Seq.empty), genSpec, ""))
        val baseRoot = branchRoots.get.head
        val lastDir = gens.last.dir
        val exclusion = GraftSqlCatalog.claimsExclusionExpr(
          partCols.getOrElse(Seq.empty), genSpec,
          declaredSchema.getOrElse(schema()), branchClaims)
        val rowExclusion =
          if (gens.size <= 1) None
          else GraftSqlCatalog.claimsRowExclusionExpr(
            partCols.getOrElse(Seq.empty), genSpec,
            declaredSchema.getOrElse(schema()), branchClaims)
        // r18 (VERDICT r17 next #2): an OLDER generation whose layout
        // ALSO materializes every claim column identically — identity
        // in both specs, or the SAME GenCol (full equality: bucket(k,2)
        // never matches an older bucket(k,4) sharing the name) — takes
        // the same PLAN-TIME partition exclusion as the current
        // generation: exact directory pruning, and the leg stays
        // COLUMNAR instead of paying the row-exclusion flip. Anything
        // weaker keeps the exact row-level exclusion — a plan-time
        // expression over a column the older leg stores as DATA would
        // demote to an inexact row-group filter and leak claimed rows.
        def claimColsPartitionSourceIn(
            sg: graft.catalog.TableCatalog.SpecGen): Boolean =
          partCols.getOrElse(Seq.empty).forall { c =>
            sg.partCols.contains(c) && (genSpec.find(_.name == c) match {
              case None => !sg.gen.exists(_.name == c)
              case Some(g) => sg.gen.contains(g)
            })
          }
        new MultiGenScanBuilder(cat, table,
          declaredSchema.getOrElse(schema()),
          branchRoots.get.flatMap(r => gens.map { sg =>
            val planTime =
              sg.dir == lastDir || claimColsPartitionSourceIn(sg)
            (if (sg.dir.isEmpty) r else s"$r/${sg.dir}", sg,
              if (r == baseRoot && planTime) exclusion.toSeq
              else Seq.empty,
              if (r == baseRoot && !planTime) rowExclusion
              else None)
          }),
          options)
      }
      else if (multiGens.size > 1)
        // lazily-evolved: one inner scan per spec generation, each
        // pruned under its own layout, unioned at partition level.
        // Rooted at the SCAN root — the pinned `_vN` snapshot for a
        // partitioned versioned table (whose generation subtrees nest
        // inside each snapshot), the live table root otherwise
        new MultiGenScanBuilder(cat, table,
          declaredSchema.getOrElse(schema()), multiGens,
          scanRoot.getOrElse(cat.path(table)), options)
      else if (genSpec.isEmpty) delegate.newScanBuilder(options)
      else new GenPruneScanBuilder(cat, table, delegate.schema,
        partCols.getOrElse(Seq.empty), genSpec, options,
        scanRoot.getOrElse(cat.path(table)))
    }
    /** `DELETE FROM g.t WHERE …`: survivors re-commit as one versioned
      * snapshot (the rewrite form of Delta's DELETE — readers keep
      * their snapshot, history logs REPLACE, the change feed classifies
      * the deletes). An untranslatable predicate refuses in ANALYSIS
      * rather than mistranslating — see [[GraftSqlCatalog.v2ToColumn]]
      * for why the V1 filter bridge must not be trusted here. */
    override def canDeleteWhere(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
        : Boolean =
      writable && branch.isEmpty &&
        predicates.forall(v2ToColumn(_).isDefined)
    override def deleteWhere(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
        : Unit = {
      require(writable, s"$table: a time-travel relation is read-only")
      import org.apache.spark.sql.functions.{coalesce, lit, not}
      val cols = predicates.toIndexedSeq.map(p => v2ToColumn(p).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE predicate not translatable: $p")))
      val cond = cols.reduceOption(_ && _).getOrElse(lit(true))
      partCols match {
        case Some(_) if partVersioned =>
          // partitioned VERSIONED: only the matching leaves rewrite,
          // committed as ONE snapshot — readers keep theirs, time
          // travel reaches the pre-delete state
          cat.deleteWherePartsVersioned(table, coalesce(cond, lit(false)))
          ()
        case Some(pcs) =>
          // partitioned plain table (single- or multi-column nesting):
          // the catalog's partition-granular purge — rewrites ONLY the
          // leaf directories containing matches, O(changed partitions),
          // the layout's whole point
          cat.deleteWhereParts(table, pcs, coalesce(cond, lit(false)))
          ()
        case None =>
          // optimistic concurrency: the survivors plan resolves against
          // the snapshot current NOW — pin it, and let the commit verb
          // re-check under the writer lock so a commit landing between
          // this read and the lock fails loudly instead of being
          // silently overwritten (the same re-check mergeInto and
          // replaceFromStaged perform)
          val expect = cat.currentVersion(table)
          // 3VL: DELETE removes rows where cond is TRUE; NULL keeps
          cat.replaceAtomicExpect(table,
            cat.read(table).filter(not(coalesce(cond, lit(false)))), expect)
      }
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      require(writable, s"$table: a time-travel relation is read-only")
      new WriteBuilder with SupportsTruncate {
        private var overwrite = false
        override def truncate(): WriteBuilder = { overwrite = true; this }
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, o: Boolean): Unit =
                (branch, partCols) match {
                  case (Some(br), _) =>
                    // SQL staging half of write-audit-publish: INSERT
                    // stages onto the branch (created on first write);
                    // OVERWRITE stages a rewrite — whole-table REPLACE
                    // mode on flat tables, and on a pv table the
                    // r16 replace-mode WAP: the staged rows' own
                    // partitions read as REPLACED on the branch
                    // (dynamic-partition-overwrite semantics under
                    // audit). Both invisible to main until
                    // publish_branch.
                    if (overwrite || o) {
                      if (cat.partitionSpecVersioned(table))
                        cat.replacePartitionsOnBranch(table, br, data)
                      else cat.replaceBranch(table, br, data)
                    }
                    else cat.appendToBranch(table, br, data)
                    ()
                  case (None, Some(_)) if partVersioned =>
                    // partitioned VERSIONED: INSERT commits a snapshot
                    // (carried leaves hard-link); OVERWRITE replaces
                    // the whole tree as one new snapshot
                    if (overwrite || o) cat.replacePartitionedVersioned(table, data)
                    else cat.appendPartitionedVersioned(table, data)
                    ()
                  case (None, Some(_)) => // partitioned plain layout
                    if (overwrite || o) cat.overwritePartitionedAll(table, data)
                    else cat.insertPartitioned(table, data)
                  case (None, None) =>
                    if (overwrite || o) cat.replaceAtomic(table, data)
                    else cat.appendAtomic(table, data)
                }
            }
        }
      }
    }
  }

  /** One SQL row-level statement (UPDATE / MERGE / rewrite-DELETE) as
    * Spark's group-based `RowLevelOperation`.
    *
    * THE SCAN REFUSES ALL PUSHDOWN, deliberately. Group-based planning
    * (`GroupBasedRowLevelOperationScanPlanning`) pushes the statement's
    * condition into this scan at GROUP granularity — the contract is
    * "return every row of any group that MIGHT match", and the write
    * replaces exactly the groups scanned. A stock parquet ScanBuilder
    * would honor the pushed condition at ROW-GROUP/row granularity,
    * silently dropping non-matching rows from the replacement data —
    * every row the statement did NOT touch would be DELETED. Hiding
    * the pushdown interfaces makes the one group "the whole table",
    * matching what [[graft.catalog.TableCatalog.replaceFromStaged]]
    * commits. (Delta/Iceberg track scanned files and replace only
    * those; this catalog's snapshot unit is the table, so the honest
    * group is the table.)
    *
    * `expect` pins the snapshot version the statement scanned —
    * `replaceFromStaged` refuses to commit over a concurrent write
    * (optimistic concurrency, the same rule the Scala `mergeInto`
    * enforces under its lock). */
  private final class GraftRowLevelOperation(delegate: ParquetTable,
      cat: graft.catalog.TableCatalog, table: String, expect: Option[Long],
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
      partCols: Option[Seq[String]],
      branchTarget: Option[(String, String)] = None,
      genSpec: Seq[graft.catalog.TableCatalog.GenCol] = Seq.empty,
      partVersioned: Boolean = false,
      multiGens: Seq[graft.catalog.TableCatalog.SpecGen] = Seq.empty)
      extends org.apache.spark.sql.connector.write.RowLevelOperation {
    import org.apache.spark.sql.connector.read.Scan
    import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
    import org.apache.spark.sql.functions.col

    override def command(): RowLevelOperation.Command = cmd

    // PARTITIONED tables narrow the group from "the whole table" to
    // "the partitions that might match": the scan builder accepts
    // pushdown of predicates referencing ONLY partition columns (every
    // row of a partition agrees on them, so partition-granular ==
    // row-granular — the silent-drop hazard the unpartitioned path
    // refuses pushdown over cannot arise) and serves exactly the
    // matching leaf directories; the write then replaces exactly those
    // leaves. The scanned-tuple set is CAPTURED ONCE at scan build and
    // the commit replaces exactly that set (ADVICE r12 medium):
    // recomputing it against live state after the distributed write
    // let a concurrently created partition that matched the predicate
    // join the replaced set — its staged rows absent, its leaf wiped.
    // A pre-image fingerprint of the scanned leaves backs it: a
    // concurrent write INTO a scanned leaf refuses the commit loudly
    // (re-run), the replaceFromStaged optimistic posture.
    @volatile private var partPred: Option[org.apache.spark.sql.Column] = None
    @volatile private var pinnedTuples
        : Option[Seq[Seq[Option[String]]]] = None
    @volatile private var pinnedPrint
        : Map[String, Seq[(String, Long)]] = Map.empty
    // the multi-generation pv route's pinned set: the generation-
    // prefixed leaf rels the scan SERVED — the commit replaces exactly
    // these (r18, the leaf-granular lift of the r17 whole-table CoW)
    @volatile private var pinnedGenRels: Option[Seq[String]] = None

    /** ENVELOPE leaf pruning for DATA-COLUMN conjuncts (r18): the one
      * whole-table posture left in row-level SQL was a predicate over
      * non-partition columns — nothing plan-time could exclude a leaf.
      * When the table carries a FRESH skipping index (`CALL
      * system.analyze(skip_cols)` at exactly this layout state), the
      * per-file min/max envelopes CAN: a leaf every one of whose files
      * provably holds no matching row is dropped from the pinned set —
      * not served, not rewritten, carried byte-identical.
      *
      * Safety is the whole design (a wrong skip = a silently missed
      * UPDATE):
      *   - pruning only engages when the envelope manifest lists
      *     EXACTLY the scanned root's on-disk files (the prunedRead
      *     freshness rule) — any append/rewrite since analyze, or an
      *     index built at another snapshot, disengages it silently
      *     (the statement keeps the whole-table posture; DML never
      *     REQUIRES an index);
      *   - file paths are content-stable here (staged files adopt
      *     under fresh unique names; snapshot carries are hard links),
      *     so a listed file's envelope can never describe other bytes;
      *   - comparisons use RELAXED bounds (`<`/`<=` both keep any file
      *     with min ≤ v — exact strictness never drops a hairline
      *     file) and the envelope's own cast("long") semantics per
      *     type (timestamps compare in floor-seconds, the indexed
      *     granularity); string envelopes compare in unsigned UTF-8
      *     order (utf8Cmp), the order that built them;
      *   - a non-derivable literal type keeps the conjunct
      *     un-judgeable → every leaf kept for it;
      *   - a file with NO bound for an indexed column is all-NULL
      *     there — comparisons are null-rejecting, so it cannot hold
      *     a match (the prunedRead rule).
      * Conservative by construction: dropping a leaf needs POSITIVE
      * disjointness proof from every file in it; everything else keeps.
      * MULTI-GENERATION tables prune the same way (r18, second
      * sitting): analyze reads the composite — one plain parquet leg
      * per generation, partition values path-derived per file — so
      * the envelope manifest covers every generation's files under
      * the same freshness rule, and each generation's pinned tuple
      * list filters by its own leaf paths.
      * Known price: a row-level rewrite mints new files, so the index
      * is stale for the NEXT statement until re-analyze — targeted-fix
      * workloads re-analyze between statements (appendIndexed-style
      * incremental envelope maintenance is the obvious lift if that
      * ever measures hot).
      */
    private def envelopePrune(tuples: Seq[Seq[Option[String]]],
        pcs: Seq[String],
        allPreds: Array[org.apache.spark.sql.connector.expressions
          .filter.Predicate]): Seq[Seq[Option[String]]] =
      envelopeKeepFn(pcs.toSet, allPreds) match {
        case None => tuples
        case Some(keep) => tuples.filter(t => keep(leafPath(pcs, t)))
      }

    /** The engaged form of the envelope prune: Some(leafPath => keep)
      * when a fresh index and judgeable conjuncts exist, None when
      * pruning is disengaged (no index, stale index, or nothing to
      * judge). `excludeCols` drops conjuncts already handled by
      * partition pruning (the single-layout caller passes its
      * partition columns; the multi-gen caller passes none — judging
      * a partition-source conjunct again is redundant but sound,
      * because analyze materializes path-derived values into each
      * file's envelope too). */
    private def envelopeKeepFn(excludeCols: Set[String],
        allPreds: Array[org.apache.spark.sql.connector.expressions
          .filter.Predicate]): Option[String => Boolean] = {
      import graft.catalog.TableCatalog
      import org.apache.spark.sql.types._
      val skipCols = cat.stats(table).map(_.skipCols).getOrElse(Seq.empty)
      if (skipCols.isEmpty) return None
      val fields = delegate.schema.fieldNames.toSet
      val cmps = GenPrune.comparisons(allPreds)
        .filter(c => skipCols.contains(c._1) && !excludeCols.contains(c._1) &&
          fields.contains(c._1))
        .map { case (c, op, vals) =>
          // NULL literals never match a comparison — drop them from
          // IN-lists; an all-NULL list is left un-judgeable (the row
          // filter answers; it matches nothing anyway)
          (c, op, vals.filter(_._1 != null))
        }
        .filter(_._3.nonEmpty)
      if (cmps.isEmpty) return None
      val envs = cat.fileEnvelopes(table)
      if (envs.isEmpty) return None
      val onDisk = cat.listParquetUrisAt(Paths.get(scanRootPath))
      if (envs.map(_.file).toSet != onDisk) return None // stale index
      val byFile = envs.map(f => f.file -> f).toMap
      def litLong(v: Any, dt: DataType): Option[Long] = dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(v.asInstanceOf[Number].longValue)
        case DateType => Some(v.asInstanceOf[Int].toLong)
        case TimestampType =>
          Some(Math.floorDiv(v.asInstanceOf[Long], 1000000L))
        case _ => None
      }
      def couldMatch(fs: TableCatalog.FileStats): Boolean =
        cmps.forall { case (c, op, vals) =>
          delegate.schema(c).dataType match {
            case StringType => (fs.smin.get(c), fs.smax.get(c)) match {
              case (Some(lo), Some(hi)) => vals.exists { case (v, _) =>
                val s = v.toString
                op match {
                  case "=" | "in" =>
                    TableCatalog.utf8Cmp(s, lo) >= 0 &&
                      TableCatalog.utf8Cmp(s, hi) <= 0
                  case "<" | "<=" => TableCatalog.utf8Cmp(lo, s) <= 0
                  case _ => TableCatalog.utf8Cmp(hi, s) >= 0
                }
              }
              case _ => false // all-NULL in this file: no match possible
            }
            case _ => (fs.min.get(c), fs.max.get(c)) match {
              case (Some(lo), Some(hi)) => vals.exists { case (v, vdt) =>
                litLong(v, vdt) match {
                  case None => true // un-judgeable literal: keep
                  case Some(x) => op match {
                    case "=" | "in" => x >= lo && x <= hi
                    case "<" | "<=" => lo <= x
                    case _ => hi >= x
                  }
                }
              }
              case _ => false // all-NULL in this file: no match possible
            }
          }
        }
      Some { leafPathStr =>
        val p0 = Paths.get(leafPathStr).toUri.toString
        val prefix = if (p0.endsWith("/")) p0 else p0 + "/"
        val leafFiles = onDisk.filter(_.startsWith(prefix))
        leafFiles.isEmpty ||
          leafFiles.exists(f => byFile.get(f).forall(couldMatch))
      }
    }

    /** (file name, size) per scanned leaf dir — the cheap pre-image the
      * commit re-checks. O(scanned-leaf files) metadata, the cost the
      * scan's own file listing already paid. ONE derivation with the
      * commit side's locked re-check ([[graft.catalog.TableCatalog
      * .leafPrintAt]]) — the pin and the expectation must never
      * drift (the r17 review rule). */
    private def leafPrint(paths: Seq[String]): Map[String, Seq[(String, Long)]] =
      paths.map(p => p -> cat.leafPrintAt(p)).toMap

    /** The tuple universe is the leaf DIRECTORY tree — O(leaf dirs)
      * driver metadata, never a table scan (projecting partition
      * values through the data would be O(rows) for an unpruned
      * statement at 100 TB). The pushed partition predicate is then
      * evaluated EXACTLY as Spark would, over a tiny local DataFrame
      * of the tuples under the partition columns' declared types. */
    private def scannedTuples(pcs: Seq[String]): Seq[Seq[Option[String]]] =
      scannedTuplesAt(scanRootPath, pcs, partPred)

    /** [[scannedTuples]] rooted at an arbitrary subtree under an
      * arbitrary layout — the per-GENERATION form the multi-gen pv
      * leaf-granular route walks (r18): `rootPath` is one generation's
      * subtree inside the pinned snapshot, `pcs` ITS partition columns,
      * `pred` the conjuncts referencing only ITS identity columns. */
    private def scannedTuplesAt(rootPath: String, pcs: Seq[String],
        pred: Option[org.apache.spark.sql.Column])
        : Seq[Seq[Option[String]]] = {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val root = Paths.get(rootPath)
      if (!Files.exists(root)) return Seq.empty
      def walk(dir: java.nio.file.Path, level: Int,
          acc: Seq[Option[String]]): Seq[Seq[Option[String]]] =
        if (level == pcs.size) Seq(acc)
        else {
          val st = Files.list(dir)
          val subs = try {
            import scala.jdk.CollectionConverters._
            st.iterator().asScala.filter(p => Files.isDirectory(p) &&
              p.getFileName.toString.startsWith(pcs(level) + "=")).toSeq
          } finally st.close()
          subs.flatMap { p =>
            val raw = p.getFileName.toString.drop(pcs(level).length + 1)
            val v =
              if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
              else Some(ExternalCatalogUtils.unescapePathName(raw))
            walk(p, level + 1, acc :+ v)
          }
        }
      val tuples = walk(root, 0, Seq.empty)
      pred match {
        case None => tuples
        case Some(pred) =>
          if (tuples.isEmpty) return Seq.empty
          val spark = SparkSession.active
          val strSchema = StructType(pcs.map(c =>
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType, nullable = true)))
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(
              tuples.map(t => org.apache.spark.sql.Row(t.map(_.orNull): _*)),
              1), strSchema)
          df.select(pcs.map(c =>
              col(c).cast(delegate.schema(c).dataType).as(c)): _*)
            .filter(pred)
            .select(pcs.map(c => col(c).cast("string")): _*)
            .collect()
            .map(r => pcs.indices.map(i =>
              Option(r.getString(i))): Seq[Option[String]]).toSeq
      }
    }

    private def leafPath(pcs: Seq[String], t: Seq[Option[String]]): String =
      pcs.zip(t).map { case (c, v) =>
        val dirName = v.fold(org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.DEFAULT_PARTITION_NAME)(
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName)
        s"$c=$dirName"
      }.mkString(scanRootPath + "/", "/", "")

    /** The directory tree this statement's scan serves: the PINNED
      * snapshot for a partitioned VERSIONED table (immutable — version
      * equality at commit time IS the freshness check), the live table
      * root otherwise. */
    private def scanRootPath: String =
      if (partVersioned)
        cat.snapshotPath(table, expect.getOrElse(0L)).toString
      else cat.path(table)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      partCols match {
        case Some(_) if multiGens.size > 1 =>
          // MULTI-GENERATION, LEAF-GRANULAR (r18, lifting the r17
          // whole-table pv posture AND the plain-lazy refusal): every
          // generation pins the leaves that MIGHT match —
          // identity-column conjuncts evaluate over that generation's
          // tuple directory values exactly as Spark would, transform
          // conjuncts derive via GenPrune (the same inversion plain
          // reads use) — and the scan serves exactly the pinned leaves
          // across generations, each under its own layout, unioned
          // through the MultiGenScan ordinal projection. The commit
          // then replaces exactly the pinned rels and adopts the
          // staged rewrite under the CURRENT generation's subtree —
          // expect-checked against the pinned snapshot version (pv) or
          // the pinned leaf prints under the writer lock (plain, whose
          // live root has no snapshot to pin). EVERY predicate is
          // returned to Spark un-consumed (row filters always apply),
          // so pruning is conservative by construction; a
          // data-column-only predicate derives nothing, pins every
          // leaf, and the statement keeps the whole-table posture.
          new ScanBuilder
              with org.apache.spark.sql.connector.read
                .SupportsPushDownV2Filters
              with org.apache.spark.sql.connector.read
                .SupportsPushDownRequiredColumns {
            import org.apache.spark.sql.connector.expressions.filter.Predicate
            private var allPreds: Array[Predicate] = Array.empty
            private var required: Option[StructType] = None
            override def pruneColumns(r: StructType): Unit =
              required = Some(r)
            override def pushPredicates(predicates: Array[Predicate])
                : Array[Predicate] = {
              allPreds = predicates // remembered for pruning, none consumed
              predicates
            }
            override def pushedPredicates(): Array[Predicate] = Array.empty
            override def build(): Scan = {
              import graft.catalog.TableCatalog.SpecGen
              // the DECLARED (gen-free) shape: the delegate's schema
              // carries the CURRENT spec's hidden columns appended —
              // each leg re-appends ITS OWN generation's, so strip
              // them here or the current generation's leg would
              // declare them twice
              val declaredNoGen = StructType(delegate.schema.fields
                .filterNot(f => genSpec.exists(_.name == f.name)))
              val out = required.getOrElse(declaredNoGen)
              val cmps = GenPrune.comparisons(allPreds)
              val pinned: Seq[(SpecGen, Seq[Seq[Option[String]]])] =
                multiGens.map { sg =>
                  val genRoot =
                    if (sg.dir.isEmpty) scanRootPath
                    else s"$scanRootPath/${sg.dir}"
                  val idCols = sg.partCols
                    .filter(c => !sg.gen.exists(_.name == c))
                  // conjuncts referencing only THIS generation's
                  // identity partition columns narrow its tuple walk
                  val pred = allPreds.toSeq
                    .filter(p => p.references().forall(r =>
                      r.fieldNames().length == 1 &&
                        idCols.contains(r.fieldNames()(0))))
                    .flatMap(v2ToColumn(_)).reduceOption(_ && _)
                  val t0 = scannedTuplesAt(genRoot, sg.partCols, pred)
                  val keeps = GenPrune.keepFns(sg.gen, cmps)
                  val t1 =
                    if (keeps.isEmpty) t0
                    else t0.filter(t =>
                      sg.partCols.zip(t).forall { case (c, v) =>
                        keeps.get(c) match {
                          case Some(keep) => v.exists(keep)
                          case None => true
                        }
                      })
                  (sg, t1)
                }
              // DATA-COLUMN conjuncts refine each generation's pinned
              // set by per-file envelope when the skipping index is
              // fresh (r18 — same engine as the single-layout path;
              // analyze's composite read covers every generation's
              // files, path-derived partition values included)
              val envKeep = envelopeKeepFn(Set.empty, allPreds)
              val pinnedEnv = envKeep match {
                case None => pinned
                case Some(keep) => pinned.map { case (sg, ts) =>
                  val genRoot =
                    if (sg.dir.isEmpty) scanRootPath
                    else s"$scanRootPath/${sg.dir}"
                  (sg, ts.filter(t => keep(genRoot + "/" +
                    graft.catalog.TableCatalog.leafRelOf(sg.partCols, t))))
                }
              }
              pinnedGenRels = Some(pinnedEnv.flatMap { case (sg, ts) =>
                ts.map(t => graft.catalog.TableCatalog.prefixedRel(sg.dir,
                  graft.catalog.TableCatalog.leafRelOf(sg.partCols, t)))
              })
              // PLAIN lazy tables expect-check the pinned listing at
              // commit time — pin each served leaf's print NOW, before
              // the distributed write starts
              if (!partVersioned)
                pinnedPrint = leafPrint(pinnedEnv.flatMap { case (sg, ts) =>
                  val genRoot =
                    if (sg.dir.isEmpty) scanRootPath
                    else s"$scanRootPath/${sg.dir}"
                  ts.map(t => genRoot + "/" + graft.catalog.TableCatalog
                    .leafRelOf(sg.partCols, t))
                }.filter(p => Files.exists(Paths.get(p))))
              val inners = pinnedEnv.flatMap { case (sg, ts) =>
                if (ts.isEmpty) None
                else {
                  val genRoot =
                    if (sg.dir.isEmpty) scanRootPath
                    else s"$scanRootPath/${sg.dir}"
                  val paths = ts.map(t => genRoot + "/" +
                      graft.catalog.TableCatalog.leafRelOf(sg.partCols, t))
                    .filter(p => Files.exists(Paths.get(p)))
                  if (paths.isEmpty) None
                  else {
                    val full = StructType(declaredNoGen.fields ++
                      sg.gen.map(g => org.apache.spark.sql.types
                        .StructField(g.name,
                          graft.catalog.TableCatalog.genDataType(g),
                          nullable = true)))
                    val opts = new java.util.HashMap[String, String](options)
                    opts.put("basePath", genRoot)
                    val csm = new CaseInsensitiveStringMap(opts)
                    val b = ParquetTable(s"$table-rlo-gen-${sg.dir}",
                      SparkSession.active, csm, paths, Some(full),
                      classOf[ParquetFileFormat]).newScanBuilder(csm)
                    b match {
                      case pr: org.apache.spark.sql.connector.read
                          .SupportsPushDownRequiredColumns =>
                        pr.pruneColumns(out)
                      case _ => ()
                    }
                    Some(b.build())
                  }
                }
              }
              new MultiGenScan(inners, out, inners.map(_ => None))
            }
          }
        case None =>
          // no FILTER pushdown — see class doc. COLUMN pruning does
          // forward: the rewrite always requires the full relation
          // output, so for ordinary tables this is a no-op, and for
          // hidden (transform) partitioning it is what keeps the
          // generated directory columns out of the scan output (the
          // relation's schema never contains them).
          new ScanBuilder with org.apache.spark.sql.connector.read
              .SupportsPushDownRequiredColumns {
            private var required: Option[StructType] = None
            override def pruneColumns(r: StructType): Unit =
              required = Some(r)
            override def build(): Scan = {
              val b = delegate.newScanBuilder(options)
              (b, required) match {
                case (pr: org.apache.spark.sql.connector.read
                    .SupportsPushDownRequiredColumns, Some(r)) =>
                  pr.pruneColumns(r)
                case _ => ()
              }
              b.build()
            }
          }
        case Some(pcs) =>
          new ScanBuilder
              with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters
              with org.apache.spark.sql.connector.read
                .SupportsPushDownRequiredColumns {
            import org.apache.spark.sql.connector.expressions.filter.Predicate
            private var accepted: Array[Predicate] = Array.empty
            private var allPreds: Array[Predicate] = Array.empty
            private var required: Option[StructType] = None
            override def pruneColumns(r: StructType): Unit =
              required = Some(r)
            override def pushPredicates(predicates: Array[Predicate])
                : Array[Predicate] = {
              // transform specs: EVERY conjunct is remembered (returned
              // to Spark un-consumed) so build() can derive gen-column
              // bounds from SOURCE-column comparisons — the same
              // inversion GenPrune does for plain reads
              allPreds = predicates
              val (ok, rest) = predicates.partition(p =>
                p.references().forall(r => r.fieldNames().length == 1 &&
                  pcs.contains(r.fieldNames()(0))) &&
                  v2ToColumn(p).isDefined)
              accepted = ok
              partPred = ok.toSeq.flatMap(v2ToColumn(_)).reduceOption(_ && _)
              rest
            }
            override def pushedPredicates(): Array[Predicate] = accepted
            override def build(): Scan = {
              // group granularity: serve exactly the leaves that might
              // match, and PIN that set + its pre-image here — the
              // commit replaces exactly these groups, whatever lands
              // concurrently (ADVICE r12 medium). An unpruned
              // statement (no partition-col predicate accepted) scans
              // the whole table and the write replaces every partition
              // that existed at scan time.
              // transform (hidden) partitioning narrows the same way:
              // gen-column bounds derived from source-column conjuncts
              // drop non-matching leaves from BOTH the served paths and
              // the pinned replaced set. Conservative by construction —
              // an unparseable value or non-derivable predicate keeps
              // the leaf; a null leaf drops only under a comparison
              // conjunct (null-rejecting for the match, and group
              // rewrite copies unmatched rows verbatim anyway).
              val genKeeps =
                if (genSpec.isEmpty) Map.empty[String, String => Boolean]
                else GenPrune.keepFns(genSpec, GenPrune.comparisons(allPreds))
              val tuples0 = scannedTuples(pcs)
              val tuples1 =
                if (genKeeps.isEmpty) tuples0
                else tuples0.filter(t => pcs.zip(t).forall { case (c, v) =>
                  genKeeps.get(c) match {
                    case Some(keep) => v match {
                      case None => false
                      case Some(raw) => keep(raw)
                    }
                    case _ => true
                  }
                })
              // data-column conjuncts prune by per-file envelope when
              // the skipping index is fresh (r18) — see envelopePrune
              val tuples = envelopePrune(tuples1, pcs, allPreds)
              pinnedTuples = Some(tuples)
              val leafPaths = tuples.map(t => leafPath(pcs, t))
                .filter(p => Files.exists(Paths.get(p)))
              pinnedPrint = leafPrint(leafPaths)
              val paths =
                if (partPred.isEmpty && genKeeps.isEmpty &&
                    tuples.size == tuples1.size) Seq(scanRootPath)
                else leafPaths
              val opts = new java.util.HashMap[String, String](options)
              opts.put("basePath", scanRootPath)
              val b = ParquetTable(s"$table-rlo-scan", SparkSession.active,
                new CaseInsensitiveStringMap(opts),
                if (paths.isEmpty) Seq(cat.path(table)) else paths,
                Some(delegate.schema), classOf[ParquetFileFormat])
                .newScanBuilder(new CaseInsensitiveStringMap(opts))
              (b, required) match {
                case (pr: org.apache.spark.sql.connector.read
                    .SupportsPushDownRequiredColumns, Some(r)) =>
                  pr.pruneColumns(r)
                case _ => ()
              }
              b.build()
            }
          }
      }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      val staging = Paths.get(cat.path(table), "_tmp_rlo_" +
        java.util.UUID.randomUUID().toString.replace("-", ""))
      // the stock parquet BatchWrite does the distributed writing and
      // its committer the task-level atomicity; staging lives UNDER the
      // table dir (same filesystem → the commit is pure renames) in the
      // `_tmp_` class vacuum() already sweeps if the statement crashes
      val inner = ParquetTable(s"$table-rlo-staging", SparkSession.active,
        CaseInsensitiveStringMap.empty(), Seq(staging.toString),
        Some(info.schema()), classOf[ParquetFileFormat])
        .newWriteBuilder(info).build()
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            private val b = inner.toBatch
            override def createBatchWriterFactory(
                p: PhysicalWriteInfo): DataWriterFactory =
              new OpStrippingFactory(b.createBatchWriterFactory(p),
                info.schema())
            override def useCommitCoordinator: Boolean = b.useCommitCoordinator
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              b.commit(messages) // staged part files land
              (branchTarget, partCols) match {
                case (Some((br, epoch)), _) =>
                  // branch DML: the fixed rows become the branch's new
                  // REPLACE-mode life; the epoch pinned at scan time
                  // makes the commit refuse a branch that changed
                  // lives mid-statement (r12 verdict #2)
                  cat.replaceBranchFromStaged(table, br, epoch, staging,
                    info.schema())
                case (None, Some(pcs)) if multiGens.size > 1 =>
                  // multi-generation (r18, leaf-granular): the scan
                  // pinned the leaves that might match per generation
                  // and served exactly those — the commit replaces
                  // exactly the pinned set (untouched leaves in every
                  // generation carry) and adopts the staged fixed ∪
                  // copied rows under the current generation's
                  // subtree. pv: hard-linked snapshot commit, expect
                  // refuses a concurrent commit; PLAIN: in-place swap
                  // whose freshness is the pinned-listing expect-check
                  // under the writer lock. A data-column predicate
                  // pinned every leaf — the whole-table posture,
                  // retained.
                  if (partVersioned)
                    cat.replaceLeavesAcrossGensFromStaged(table,
                      staging, pinnedGenRels.getOrElse(
                        throw new IllegalStateException(
                          s"row-level write on '$table' committed " +
                            "without a built scan — cannot determine " +
                            "the replaced leaf set")),
                      info.schema(), expect.getOrElse(
                        throw new IllegalStateException(
                          s"'$table' loaded without a pinned version")))
                  else {
                    require(pinnedGenRels.isDefined,
                      s"row-level write on '$table' committed without " +
                        "a built scan — cannot determine the replaced " +
                        "leaf set")
                    cat.replaceLeavesAcrossGensFromStagedPlain(table,
                      staging, pinnedPrint, info.schema())
                  }
                case (None, Some(pcs)) =>
                  // partition-granular: replace EXACTLY the leaves the
                  // scan pinned at build time — never a recomputed
                  // live set (a partition created mid-statement would
                  // join it with no staged rows and be wiped, ADVICE
                  // r12 medium) — and refuse if any scanned leaf's
                  // files moved under the statement (the optimistic
                  // re-check the unpartitioned path gets from expect)
                  val tuples = pinnedTuples.getOrElse(
                    throw new IllegalStateException(
                      s"row-level write on '$table' committed without " +
                        "a built scan — cannot determine the replaced " +
                        "partition set"))
                  if (partVersioned)
                    // snapshot layout: the scan served the PINNED
                    // immutable snapshot, so the only staleness is a
                    // commit that landed since — the expect check
                    // inside the snapshot replace covers it
                    cat.replacePartitionsFromStagedVersioned(table,
                      staging, tuples, info.schema(), expect.getOrElse(
                        throw new IllegalStateException(
                          s"'$table' loaded without a pinned version")))
                  else {
                    val moved = pinnedPrint.collect {
                      case (p, pre) if leafPrint(Seq(p))(p) != pre => p
                    }
                    require(moved.isEmpty,
                      s"partition(s) ${moved.take(3).mkString(", ")} of " +
                        s"'$table' changed since this row-level statement " +
                        "scanned them — the staged rewrite is stale; re-run")
                    cat.replacePartitionsFromStaged(table, staging, pcs,
                      tuples, info.schema())
                  }
                case (None, None) =>
                  cat.replaceFromStaged(table, staging, cmd.toString, expect,
                    info.schema())
              }
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit =
              try b.abort(messages)
              finally graft.catalog.TableCatalog.deleteRecursively(staging)
          }
        }
      }
    }
  }

  /** Strips the leading `__row_operation` column Spark's group-based
    * rewrite prepends to every replacement row. When the operation
    * declares NO metadata attributes (this catalog's tables have no
    * metadata columns), `ReplaceDataExec.writingTask` falls back to the
    * plain `DataWritingSparkTask`, which hands the writer the RAW query
    * output — operation column included — instead of applying the row
    * projection it applies on the metadata path (connectors like
    * Iceberg never hit this: they always require `_file`, so they
    * always get the projecting task). Writing that raw row through the
    * parquet writer overflows the declared schema. The wrapper projects
    * each (1 + n)-field row onto its n data columns with Spark's own
    * `ProjectingInternalRow` — zero-copy per row — and passes
    * already-clean rows through untouched. */
  private final class OpStrippingFactory(
      inner: org.apache.spark.sql.connector.write.DataWriterFactory,
      schema: StructType)
      extends org.apache.spark.sql.connector.write.DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : org.apache.spark.sql.connector.write.DataWriter[
          org.apache.spark.sql.catalyst.InternalRow] = {
      val w = inner.createWriter(partitionId, taskId)
      val n = schema.length
      new org.apache.spark.sql.connector.write.DataWriter[
          org.apache.spark.sql.catalyst.InternalRow] {
        private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
          schema, (1 to n).toIndexedSeq)
        override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
          if (row.numFields == n + 1) { proj.project(row); w.write(proj) }
          else w.write(row)
        override def commit()
            : org.apache.spark.sql.connector.write.WriterCommitMessage =
          w.commit()
        override def abort(): Unit = w.abort()
        override def close(): Unit = w.close()
      }
    }
  }
}
