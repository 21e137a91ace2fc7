package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** HexTopBitsPack: the packed single-pass form must agree bit-for-bit
  * with the composed-builtins definition it replaced (64 × substring
  * top-bit tests), on both the interpreted and codegen paths.
  */
class HexTopBitsPackSpec extends SparkSuite {
  import spark.implicits._

  private def composed(hcol: String): Seq[org.apache.spark.sql.Column] =
    (0 until 16).map { f =>
      (0 until 4).map { k =>
        when(substring(col(hcol), 4 * f + k + 1, 1) >= "8",
          lit(1L << (16 * k))).otherwise(lit(0L))
      }.reduce(_ + _).as(s"e$f")
    }

  test("packed fields equal the composed substring form on md5 digests") {
    val df = (1 to 200).map(i => s"token$i").toDF("t")
      .select(concat(md5(col("t")), md5(concat(lit("x"), col("t")))).as("h"))
      .select(col("h"), HexTopBitsPack(col("h")).as("p"))
      .select(col("h") +: (0 until 16).map(f =>
        element_at(col("p"), f + 1).as(s"p$f")): _*)
      .select(col("h") +: (0 until 16).map(f => col(s"p$f")) ++: composed("h"): _*)
    val bad = df.where((0 until 16).map(f =>
      col(s"p$f") =!= col(s"e$f")).reduce(_ || _)).count()
    assert(bad == 0)
  }

  test("short and empty inputs: absent digits contribute no bits") {
    val rows = Seq("", "f", "07", "ffffffff").toDF("h")
      .select(HexTopBitsPack(col("h")).as("p")).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).forall(_ == 0L), "empty string packs to all-zero")
    assert(rows(1) == Seq.tabulate(16)(f => if (f == 0) 1L else 0L),
      "'f' sets exactly field 0 bit 0")
    assert(rows(2).forall(_ == 0L), "'07' has no top bits")
    assert(rows(3) == Seq.tabulate(16)(f =>
      if (f == 0) 1L + (1L << 16) + (1L << 32) + (1L << 48)
      else if (f == 1) 1L + (1L << 16) + (1L << 32) + (1L << 48)
      else 0L), "8 'f's fill fields 0 and 1")
  }

  test("interpreted eval matches codegen") {
    // a filter over a literal forces the interpreted path in constant
    // folding; compare against the dataframe (codegen) result
    val lit64 = "a" * 64
    val viaEval = HexTopBitsPack(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(lit64)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaDf = Seq(lit64).toDF("h")
      .select(HexTopBitsPack(col("h")).as("p")).head.getSeq[Long](0)
    assert(viaEval == viaDf)
    assert(viaEval == Seq.tabulate(16)(_ =>
      1L + (1L << 16) + (1L << 32) + (1L << 48)), "'a' has its top bit set")
  }
}
