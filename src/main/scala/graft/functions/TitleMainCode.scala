package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused title-code extraction (SURVEY.md §7.3a): F1 last-word + F3/F4/F5
  * purge rules in ONE string pass, replacing a translate/split/element_at/
  * regexp chain (which allocates a token array and scans the string ~4×)
  * with a single backward scan. Semantics identical to
  * graft.ops.TitleCode.mainCode (ref dataingestion2.py:33-51) — verified
  * against it in ExtensionsSpec.
  */
case class TitleMainCode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "title_main_code"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TitleMainCode.compute(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.TitleMainCode.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): TitleMainCode =
    copy(child = newChild)
}

object TitleMainCode {
  /** One backward pass: find the last token (treating '|' as whitespace),
    * then apply the purge gates. */
  def compute(title: String): String = {
    def isSep(c: Char) = c == '|' || Character.isWhitespace(c)
    var end = title.length
    while (end > 0 && isSep(title.charAt(end - 1))) end -= 1
    if (end == 0) return ""
    var start = end - 1
    while (start > 0 && !isSep(title.charAt(start - 1))) start -= 1
    val len = end - start
    if (len < 3 || len > 5) return ""             // F3 length gate
    var digits = 0; var lower = 0; var i = start
    while (i < end) {
      val c = title.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      if (c >= 'a' && c <= 'z') lower += 1
      i += 1
    }
    if (digits == len) return ""                  // F4 all-digit purge
    if (lower > 1) return ""                      // F5 multi-lowercase purge
    title.substring(start, end)
  }

  def titleMainCode(c: Column): Column =
    GraftBridge.column(TitleMainCode(Cast(GraftBridge.expression(c), StringType)))
}
