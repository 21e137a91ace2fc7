package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash bit-extraction over a hex digest in ONE pass: for each of the
  * first 64 hex digits of the input, test its top bit (digit >= '8' —
  * ASCII order makes that one byte compare) and pack the 0/1 outcomes
  * four-to-a-long in 16-bit fields: element f of the result holds bits
  * 4f..4f+3, bit k at `1L << 16k`. Summing these arrays per document
  * gives per-bit occurrence counts, from which the majority vote is
  * `2·ones > n`.
  *
  * The composed-builtins form (64 × `substring(h, b, 1) >= "8"`) spends
  * ~6× the signature-build time allocating a UTF8String slice and running
  * a collation-aware compare per bit per token; this expression is a
  * single primitive byte loop inside whole-stage codegen. Same contract:
  * digits past the input length count as 0 (absent top bit).
  */
case class HexTopBitsPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hex_topbits_pack"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(h: Any): Any = {
    val s = h.asInstanceOf[UTF8String]
    val out = new Array[Long](16)
    val n = math.min(64, s.numBytes)
    var i = 0
    while (i < n) {
      if (s.getByte(i) >= '8') out(i >> 2) += 1L << (16 * (i & 3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val arr = ctx.freshName("arr")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long[] $arr = new long[16];
         |int $n = java.lang.Math.min(64, $h.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($h.getByte($i) >= (byte) '8') {
         |    $arr[$i >> 2] += 1L << (16 * ($i & 3));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexTopBitsPack =
    copy(child = newChild)
}

object HexTopBitsPack {
  /** Column-facing packer (expects a hex-digest string column). */
  def apply(h: Column): Column =
    GraftBridge.column(HexTopBitsPack(GraftBridge.expression(h)))
}
