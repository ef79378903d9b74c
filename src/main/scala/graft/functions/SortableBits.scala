package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The ORDER-PRESERVING double ↔ int64 bijection (the Lucene/HBase
  * "sortable bits" transform) — what lets [[graft.ops.Quantiles]] run
  * its bounded bucketed search over DOUBLE domains without callers
  * pre-scaling to integers (r17 verdict next #3):
  *
  *   - non-negative doubles: the raw IEEE-754 bits, already ascending
  *     as signed int64 (sign bit 0);
  *   - negative doubles: raw bits have the sign bit set (so they order
  *     BELOW every non-negative image) but ascend the wrong way —
  *     flipping the lower 63 bits reverses them in place.
  *
  * Total order vs IEEE quirks: `x + 0.0` collapses -0.0 into +0.0
  * before the transform (the two compare equal but carry different
  * bits), and `doubleToLongBits` canonicalizes every NaN payload —
  * NaN maps above +Infinity, exactly Spark's `Double.compare` order.
  *
  * Both directions are tight codegen'd bit ops (one branchless xor
  * with a sign-propagated mask) so the transform rides inside
  * whole-stage codegen on the per-row hot path. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"

  override def nullSafeEval(x: Any): Any =
    DoubleSortableBits.toSortable(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DoubleSortableBits.toSortable($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : DoubleSortableBits = copy(child = newChild)
}

object DoubleSortableBits {
  /** Static so generated code and interpreted eval share one body:
    * sign-propagated mask keeps non-negatives as-is and flips the
    * lower 63 bits of negatives (branchless `>> 63` arithmetic). */
  def toSortable(x: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(x + 0.0)
    b ^ ((b >> 63) & Long.MaxValue)
  }
  def apply(c: Column): Column =
    CatalystBridge.column(DoubleSortableBits(CatalystBridge.expression(c)))
}

/** Inverse of [[DoubleSortableBits]] — recovers the double a sortable
  * int64 image encodes. Only ever applied to values the forward
  * transform produced (the crossing-bucket order statistics), so every
  * input is a valid image. */
case class SortableBitsDouble(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sortable_bits_double"

  override def nullSafeEval(s: Any): Any =
    SortableBitsDouble.fromSortable(s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortableBitsDouble.fromSortable($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SortableBitsDouble = copy(child = newChild)
}

object SortableBitsDouble {
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
  def apply(c: Column): Column =
    CatalystBridge.column(SortableBitsDouble(CatalystBridge.expression(c)))
}
