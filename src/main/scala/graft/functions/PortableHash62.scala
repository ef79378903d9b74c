package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.CatalystBridge

/** Codegen'd engine-portable 62-bit string hash: two independent
  * polynomial code-point folds — base 31 mod 1e9+7 in the low 32 bits,
  * base 37 mod 998244353 shifted into the high word.
  *
  * Replaces the HOF formulation in [[graft.ops.Dedup.portableTokenHashHof]]
  * (`aggregate(transform(split(tok, ""), ascii), ...)`), which allocates a
  * one-character UTF8String per code point and dispatches two interpreted
  * lambda folds per token. This expression is a single compiled loop over
  * the string — no per-character allocation, both folds fused in one pass.
  * OpsSpec asserts value equality with the HOF form.
  *
  * Semantics: iterates Unicode code points (`String.codePointAt`), which
  * is exactly what DuckDB replays via
  * `list_transform(string_split(tok, ''), c -> ord(c))` — the property the
  * oracle queries (x_dedup_simhash, x_splits) depend on. Every
  * intermediate stays below 2^35; bits 30-31 and 62-63 are always zero.
  * NULL input → NULL, matching the HOF form.
  */
case class PortableHash62(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash62"

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      lo = (lo * 31L + cp) % 1000000007L
      hi = (hi * 37L + cp) % 998244353L
      i += Character.charCount(cp)
    }
    lo | (hi << 32)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $str = $s.toString();
         |long $lo = 0L, $hi = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $lo = ($lo * 31L + $cp) % 1000000007L;
         |  $hi = ($hi * 37L + $cp) % 998244353L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $lo | ($hi << 32);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PortableHash62 =
    copy(child = newChild)
}

object PortableHash62 {
  def portableHash62(str: Column): Column =
    CatalystBridge.column(PortableHash62(CatalystBridge.expression(str)))

  /** Non-linear mix of the two folds — REQUIRED before using the hash
    * as a sort key or uniform bucket on SHORT strings: an unwrapped
    * polynomial fold is order-preserving (for a 5-char key the
    * leading-char weight is 31⁴ ≈ 9.2e5, far below the 1e9+7 modulus,
    * so "ep1:0" < "ep1:1" < … hash in ID order and a hash "shuffle"
    * degenerates to the identity — caught by SelectionSpec). The
    * product of the two residues wraps the modulus ~1e9 times,
    * destroying the linear structure, while staying exact int64 on
    * both engines (lo < 1e9+7, hi < 998244353 ⇒ lo·hi < 2⁶³).
    * SQL replay: `(h%2³² * (h//2³²) + h%2³² + h//2³²) % 1000000007`. */
  def mix62(h: Column): Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    val lo = h % 4294967296L
    val hi = call_function("div", h, lit(4294967296L))
    (lo * hi + lo + hi) % 1000000007L
  }
}
