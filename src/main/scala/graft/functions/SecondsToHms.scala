package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F12 — seconds → `H:MM:SS` with exact Python `str(datetime.timedelta)`
  * parity, including the `N day(s), H:MM:SS` prefix past 24h and the
  * floor-division behavior on negatives
  * (ref: Python-pipeline/dataprocessing.py:150).
  *
  * Implemented as a native Catalyst Expression WITH codegen (not a Scala
  * UDF): stays inside whole-stage codegen, no serialization, null-safe.
  */
case class SecondsToHms(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "seconds_to_hms"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(SecondsToHms.format(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.SecondsToHms.format($c))")

  override protected def withNewChildInternal(newChild: Expression): SecondsToHms =
    copy(child = newChild)
}

object SecondsToHms {
  /** Exact mirror of CPython timedelta.__str__ for whole seconds. */
  def format(totalSeconds: Long): String = {
    val days = Math.floorDiv(totalSeconds, 86400L)
    val rem = Math.floorMod(totalSeconds, 86400L)
    val h = rem / 3600; val m = (rem % 3600) / 60; val s = rem % 60
    val hms = f"$h%d:$m%02d:$s%02d"
    if (days == 0) hms
    else if (days == 1 || days == -1) s"$days day, $hms"
    else s"$days days, $hms"
  }

  /** Column-facing API. */
  def secondsToHms(c: Column): Column =
    GraftBridge.column(SecondsToHms(Cast(GraftBridge.expression(c), LongType)))
}
