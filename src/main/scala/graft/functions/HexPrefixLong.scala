package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse the first `n` hex digits of a string to a non-negative long —
  * the codegen form of `conv(substring(h, 1, n), 16, 10)` (equivalently
  * DuckDB's `('0x' || substr(h, 1, n))::BIGINT`), the hash→integer idiom
  * behind every md5-derived bucket/draw in the battery. The composed
  * builtins allocate a UTF8String slice, then run conv's generic
  * radix-string machinery per value; this is a primitive byte loop that
  * whole-stage codegen inlines. `n` is capped at 15 digits (60 bits) so
  * the result never overflows a signed long; digits past the input
  * length stop the parse (conv's behavior on short strings).
  */
case class HexPrefixLong(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 15, s"hex_prefix_long digit count must be 1..15, got $n")
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_prefix_long"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(h: Any): Any = {
    val s = h.asInstanceOf[UTF8String]
    val lim = math.min(n, s.numBytes)
    var acc = 0L
    var i = 0
    while (i < lim) {
      val b = s.getByte(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else -1
      if (d < 0) return acc
      acc = (acc << 4) | d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val lim = ctx.freshName("lim")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val dd = ctx.freshName("dd")
      s"""
         |int $lim = java.lang.Math.min($n, $h.numBytes());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $lim; $i++) {
         |  byte $b = $h.getByte($i);
         |  int $dd = ($b >= '0' && $b <= '9') ? $b - '0'
         |      : ($b >= 'a' && $b <= 'f') ? $b - 'a' + 10
         |      : ($b >= 'A' && $b <= 'F') ? $b - 'A' + 10 : -1;
         |  if ($dd < 0) break;
         |  ${ev.value} = (${ev.value} << 4) | $dd;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexPrefixLong =
    copy(child = newChild)
}

object HexPrefixLong {
  /** Column form: hex-prefix value of `c`'s first `n` hex digits. */
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(HexPrefixLong(GraftBridge.expression(c), n))
}
