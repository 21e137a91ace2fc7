package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime bloom-filter membership probe — the manual form of the
  * runtime row-level filtering Spark's own InjectRuntimeFilter plants
  * (`BloomFilterMightContain`, which is not user-invokable): `left` is
  * the probed long key, `right` a FOLDABLE binary column holding a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (built once,
  * e.g. via `df.stat.bloomFilter`, and shipped as a literal — a few
  * hundred KB standing in for the multi-GB fact-side shuffle it
  * prevents).
  *
  * The filter deserializes ONCE per executor (lazy transient; the
  * codegen path pins it as a referenced object, so the hot loop is one
  * virtual call on a long — no per-row deserialization, no boxing).
  * Guarantees: no false negatives ever, ≤ fpp false positives — so
  * `fact.where(bloom_might_contain(key, filter)).join(dim, key)` is
  * EXACTLY `fact.join(dim, key)`, minus ~(1-fpp) of the non-matching
  * fact rows before they reach the exchange.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe key, got ${left.dataType.sql}")
    else if (right.dataType != BinaryType || !right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary serialized bloom filter")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom filter literal is null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $bloomRef.mightContainLong(${leftGen.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Column-facing probe: `key` a bigint column, `filter` a serialized
    * BloomFilter (see [[serialize]]). */
  def apply(key: Column, filter: Array[Byte]): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(key),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        filter, BinaryType)))

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}
