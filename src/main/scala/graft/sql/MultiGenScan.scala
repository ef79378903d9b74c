package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.TableCatalog

/** DSv2 scan for a MULTI-GENERATION (lazily evolved) partitioned
  * table: one inner parquet scan per spec generation, each rooted at
  * its own subtree under its own layout — so Spark's partition pruning
  * and predicate pushdown run PER GENERATION — unioned at the
  * InputPartition level. This is what makes `repartitionTableLazy`
  * fully usable from SQL: before it, a multi-generation table refused
  * SQL reads (one ParquetTable delegate can only discover one layout).
  *
  * Correctness notes:
  *  - every predicate is returned to Spark UN-consumed (row filters
  *    always apply), so per-generation pruning can only narrow;
  *  - each inner scan is pruned to the SAME required column set, but a
  *    FileTable orders its output data-columns-then-partition-columns,
  *    and WHICH columns are path-derived differs per generation — so
  *    each generation's rows project onto the required order before
  *    union (a per-row zero-copy ordinal projection);
  *  - readers are COLUMNAR when every generation's pruned output is
  *    already in the required order (the required columns exclude the
  *    partition fields the generations disagree on — then the inner
  *    vectorized batches union as-is); a read needing a per-generation
  *    ordinal projection falls back to rows, the honest cost the
  *    compaction verb collapses. */
private[sql] final class MultiGenScanBuilder(
    cat: TableCatalog, table: String, declared: StructType,
    legs: Seq[(String, TableCatalog.SpecGen,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      Option[org.apache.spark.sql.catalyst.expressions.Expression])],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    // NOTE (ADVICE r15 low #5): SupportsPushDownCatalystFilters is a
    // Spark-INTERNAL trait (org.apache.spark.sql.internal.connector) —
    // the only seam FileScanBuilder receives partition filters through,
    // since the public V2 Predicate interface never reaches the inner
    // builders' partition-pruning path. Version-fragile by nature: on
    // every Spark upgrade, MultiGenPlanSpec's pruning assertions are
    // the tripwire that this trait still binds.
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** The per-generation form: one leg per spec generation, each rooted
    * at its own subtree under `root`. */
  def this(cat: TableCatalog, table: String, declared: StructType,
      gens: Seq[TableCatalog.SpecGen], root: String,
      options: CaseInsensitiveStringMap) =
    this(cat, table, declared,
      gens.map(sg => (if (sg.dir.isEmpty) root else s"$root/${sg.dir}",
        sg, Seq.empty[org.apache.spark.sql.catalyst.expressions
          .Expression],
        Option.empty[org.apache.spark.sql.catalyst.expressions
          .Expression])), options)

  private var catalystFilters
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil
  private var required: Option[StructType] = None
  // canary state (r17 verdict next #8): how many inner builders
  // actually ACCEPTED catalyst filters at build time — carried on the
  // built scan so MultiGenPlanSpec can fail loudly if a Spark upgrade
  // drops the internal trait from FileScanBuilder (pruning would
  // silently regress to plan-every-leaf otherwise)
  private var innerAccepted: Int = 0

  /** CATALYST filters, the interface the file-source builders speak
    * (r15 — the V2-Predicate interface was a dead letter here: each
    * inner builder is a FileScanBuilder, which only receives partition
    * filters through this seam, so the composite used to PLAN every
    * leaf and rely on row filters). The filters forward to EVERY
    * generation's builder, which splits partition vs data filters
    * under ITS OWN partition schema and binds them BY NAME — a filter
    * on a column one generation partitions by and another stores as
    * data prunes the first and row-group-filters the second. ALL
    * filters are returned un-consumed (row filters still apply), so
    * pruning can only narrow. */
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    catalystFilters = filters
    filters
  }
  override def pushedFilters: Array[Predicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression}
    val out = required.getOrElse(declared)
    // a leg with no directory contributes no scan: plain lazy tables
    // create their `_g<k>` dirs eagerly, but a pv SNAPSHOT only grows
    // a generation's subtree at its first post-evolution append —
    // pre-evolution snapshots (time travel) simply lack the dir
    val inners = legs.filter { case (dir, _, _, _) =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir.stripPrefix("file:")))
    }.map { case (genDir, sg, extra, rowFilter) =>
      val full = StructType(declared.fields ++ sg.gen.map(g =>
        org.apache.spark.sql.types.StructField(g.name,
          TableCatalog.genDataType(g), nullable = true)))
      val opts = new java.util.HashMap[String, String](options)
      opts.put("basePath", genDir)
      val csm = new CaseInsensitiveStringMap(opts)
      val b = ParquetTable(s"$table-gen-${sg.dir}", SparkSession.active,
        csm, Seq(genDir), Some(full), classOf[ParquetFileFormat])
        .newScanBuilder(csm)
      b match {
        case f: org.apache.spark.sql.internal.connector
            .SupportsPushDownCatalystFilters =>
          // the inner splits partition vs data filters under ITS spec;
          // partition filters bind to directory values BY NAME, so the
          // outer plan's attributes resolve regardless of expr ids.
          // `extra` carries leg-LOCAL filters the caller guarantees are
          // pure partition predicates (a replace-mode branch's
          // claimed-leaf exclusion on the base tree) — exact at plan
          // time because every referenced column is a partition column
          // of this leg's spec.
          f.pushFilters(catalystFilters ++ extra)
          innerAccepted += 1
        case _ => ()
      }
      // a leg-local ROW filter (a replace-mode branch's claim
      // exclusion over an OLDER generation, whose foreign layout a
      // partition predicate can't address — r17 verdict next #1) may
      // reference declared columns the query didn't ask for: the
      // inner scan reads them too, the reader evaluates the filter,
      // and the ordinal projection drops them from the output
      val need = rowFilter.map(_.references.map(_.name).toSet
        .diff(out.fieldNames.toSet)).getOrElse(Set.empty[String])
      val pruneTo =
        if (need.isEmpty) out
        else StructType(out.fields ++
          full.fields.filter(f => need.contains(f.name)))
      b match {
        case pr: org.apache.spark.sql.connector.read
            .SupportsPushDownRequiredColumns => pr.pruneColumns(pruneTo)
        case _ => ()
      }
      val scan = b.build()
      // bind the row filter to the INNER scan's actual output ordinals
      // by name — serializable, evaluated per row on the executors
      val bound: Option[Expression] = rowFilter.map { e =>
        val inner = scan.readSchema()
        e.transform { case a: AttributeReference =>
          BoundReference(inner.fieldIndex(a.name), a.dataType, a.nullable)
        }
      }
      (scan, bound)
    }
    new MultiGenScan(inners.map(_._1), out, inners.map(_._2),
      receivedFilters = catalystFilters, innerAccepted = innerAccepted)
  }
}

private[sql] final class MultiGenScan(inners: Seq[Scan], out: StructType,
    conds: Seq[Option[org.apache.spark.sql.catalyst.expressions.Expression]],
    /** What the builder RECEIVED through the internal
      * SupportsPushDownCatalystFilters seam, and how many inner
      * builders accepted the forward — the Spark-upgrade canary
      * MultiGenPlanSpec reads (r17 verdict next #8). */
    private[sql] val receivedFilters
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
    private[sql] val innerAccepted: Int = 0)
    extends Scan {
  override def readSchema(): StructType = out
  override def description(): String =
    s"MultiGenScan(${inners.size} generations)"
  override def toBatch: Batch = new Batch {
    private val batches = inners.map(_.toBatch)
    // ordinal mapping inner-output → required order, None when aligned
    private val projs: Array[Option[IndexedSeq[Int]]] = inners.map { s =>
      val inner = s.readSchema()
      if (inner.fieldNames.sameElements(out.fieldNames)) None
      else Some(out.fieldNames.map(inner.fieldIndex).toIndexedSeq)
    }.toArray
    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, i) =>
        b.planInputPartitions().map(p =>
          MultiGenPartition(i, p): InputPartition)
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new MultiGenReaderFactory(
        batches.map(_.createReaderFactory()).toArray, projs, out,
        conds.toArray)
  }
}

private[sql] final case class MultiGenPartition(gen: Int,
    inner: InputPartition) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

private[sql] final class MultiGenReaderFactory(
    factories: Array[PartitionReaderFactory],
    projs: Array[Option[IndexedSeq[Int]]], out: StructType,
    conds: Array[Option[org.apache.spark.sql.catalyst.expressions.Expression]]
      = Array.empty)
    extends PartitionReaderFactory {
  // COLUMNAR whenever the inner reader is (r16, closing the r15
  // documented cost): a generation whose pruned output order differs
  // from the required order gets a ZERO-COPY ordinal projection — the
  // batch's column vectors are re-ordered into a wrapper
  // ColumnarBatch; no values move, no per-row work. (Spark's exec
  // still demands ALL partitions agree on columnar-ness; a generation
  // whose inner reader can't vectorize flips the whole scan to rows,
  // which is the inner readers' rule, not this factory's.) Any leg
  // carrying a row-level claim exclusion flips the WHOLE scan to rows
  // — uniformly, since the exec demands agreement — the honest cost of
  // auditing a replace branch on a lazily-evolved table before its
  // compaction.
  private val anyCond = conds.exists(_.isDefined)
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val mp = partition.asInstanceOf[MultiGenPartition]
    !anyCond && factories(mp.gen).supportColumnarReads(mp.inner)
  }
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val mp = partition.asInstanceOf[MultiGenPartition]
    val inner = factories(mp.gen).createColumnarReader(mp.inner)
    projs(mp.gen) match {
      case None => inner
      case Some(ix) => new PartitionReader[
          org.apache.spark.sql.vectorized.ColumnarBatch] {
        override def next(): Boolean = inner.next()
        override def get()
            : org.apache.spark.sql.vectorized.ColumnarBatch = {
          val b = inner.get()
          // the wrapper shares the inner batch's vectors (closed by
          // the inner reader, never here) — only the ORDER changes
          val cols = ix.map(b.column)
            .toArray[org.apache.spark.sql.vectorized.ColumnVector]
          new org.apache.spark.sql.vectorized.ColumnarBatch(
            cols, b.numRows())
        }
        override def close(): Unit = inner.close()
      }
    }
  }
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[MultiGenPartition]
    val inner0 = factories(mp.gen).createReader(mp.inner)
    // leg-local row filter first (the claim exclusion, bound to the
    // inner output's ordinals at plan time; the predicate compiles
    // HERE, on the executor — generated code is not serializable)
    val inner = (if (conds.isEmpty) None else conds(mp.gen)) match {
      case None => inner0
      case Some(cond) => new PartitionReader[InternalRow] {
        private val pred = org.apache.spark.sql.catalyst.expressions
          .Predicate.create(cond)
        pred.initialize(0)
        override def next(): Boolean = {
          while (inner0.next()) if (pred.eval(inner0.get())) return true
          false
        }
        override def get(): InternalRow = inner0.get()
        override def close(): Unit = inner0.close()
      }
    }
    projs(mp.gen) match {
      case None => inner
      case Some(ix) => new PartitionReader[InternalRow] {
        private val proj =
          org.apache.spark.sql.catalyst.ProjectingInternalRow(out, ix)
        override def next(): Boolean = inner.next()
        override def get(): InternalRow = {
          proj.project(inner.get()); proj
        }
        override def close(): Unit = inner.close()
      }
    }
  }
}
