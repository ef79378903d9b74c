package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Parser extension for the Iceberg-standard partition-spec DDL Spark's
  * own grammar lacks (r13 verdict #6):
  *
  *   ALTER TABLE g.t ADD  PARTITION FIELD days(ts) | bucket(8, k) | c
  *   ALTER TABLE g.t DROP PARTITION FIELD bucket(8, k) | c
  *
  * Everything else delegates to Spark's parser untouched. The verb maps
  * onto [[graft.catalog.TableCatalog.repartitionTableTransformed]] —
  * the EAGER rewrite (Iceberg evolves lazily; the metadata-only form
  * is the Scala `repartitionTableLazy` — its multi-generation state
  * reads fine from SQL via the composite per-generation scan, but
  * row-level DML on it waits for compaction). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val AlterField =
    """(?is)\s*ALTER\s+TABLE\s+([\w`.]+)\s+(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case AlterField(ident, verb, field) =>
      AlterPartitionFieldCommand(ident, verb.equalsIgnoreCase("ADD"),
        field.trim)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `ALTER TABLE … ADD/DROP PARTITION FIELD <field>` — resolves the
  * graft catalog by name, rebuilds the current spec ± the field, and
  * evolves through the catalog's repartition verb. Returns the new
  * spec as one row. */
case class AlterPartitionFieldCommand(ident: String, add: Boolean,
    field: String) extends LeafRunnableCommand {
  import graft.catalog.TableCatalog

  override def output: Seq[Attribute] =
    Seq(AttributeReference("partition_spec", StringType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val parts0 = ident.split('.')
      .map(_.stripPrefix("`").stripSuffix("`")).toSeq
    val (catName, table) = parts0 match {
      case Seq(c, t) => (c, t)
      case Seq(t) =>
        (spark.sessionState.catalogManager.currentCatalog.name(), t)
      case _ => throw new IllegalArgumentException(
        s"ALTER TABLE ... PARTITION FIELD expects [catalog.]table, " +
          s"got '$ident'")
    }
    val gcat = spark.sessionState.catalogManager.catalog(catName) match {
      case g: GraftSqlCatalog => g
      case other => throw new UnsupportedOperationException(
        s"catalog '$catName' (${other.getClass.getName}) does not " +
          "support PARTITION FIELD evolution")
    }
    val cat = gcat.tableCatalog
    val Tf = """(?i)(days|months|years|hours)\s*\(\s*(\w+)\s*\)""".r
    val TfN = """(?i)(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)""".r
    val newField: (String, String, Int) = field match {
      case Tf(kind, src) => (kind.toLowerCase, src, 0)
      case TfN(kind, n, src) => (kind.toLowerCase, src, n.toInt)
      case id if id.matches("""\w+""") => ("identity", id, 0)
      case other => throw new IllegalArgumentException(
        s"unparseable partition field '$other' — identity column, " +
          "days/months/years/hours(col), bucket(n, col), truncate(w, col)")
    }
    val curCols = cat.partitionSpec(table).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"'$table' is not a partitioned table — PARTITION FIELD " +
          "evolution needs a partition spec"))
    val gen = cat.partitionGen(table).map(g => g.name -> g).toMap
    val curParts: Seq[(String, String, Int)] = curCols.map { c =>
      gen.get(c) match {
        case Some(g) => (g.kind, g.src,
          if (g.kind == "bucket") g.n
          else if (g.kind == "truncate") TableCatalog.truncWidth(g)
          else 0)
        case None => ("identity", c, 0)
      }
    }
    def fieldName(p: (String, String, Int)): String =
      if (p._1 == "identity") p._2 else TableCatalog.genName(p._1, p._2)
    val newParts =
      if (add) {
        require(!curParts.exists(p => fieldName(p) == fieldName(newField)),
          s"partition field ${fieldName(newField)} is already in the " +
            s"spec of '$table'")
        curParts :+ newField
      } else {
        val kept = curParts.filterNot(p =>
          fieldName(p) == fieldName(newField))
        require(kept.size < curParts.size,
          s"no partition field of '$table' matches '$field' " +
            s"(spec: ${curParts.map(fieldName).mkString(", ")})")
        require(kept.nonEmpty,
          "dropping the last partition field would unpartition the " +
            "table — rewrite via CTAS instead")
        kept
      }
    cat.repartitionTableTransformed(table, newParts)
    Seq(Row(newParts.map {
      case ("identity", src, _) => src
      case (k, src, 0) => s"$k($src)"
      case (k, src, n) => s"$k($n, $src)"
    }.mkString(", ")))
  }
}
