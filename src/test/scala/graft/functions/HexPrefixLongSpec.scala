package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** HexPrefixLong: the codegen byte-loop must agree value-for-value with
  * the composed builtins it replaces — conv(substring(h, 1, n), 16, 10)
  * — which in turn is the oracle's ('0x' || substr(h, 1, n))::BIGINT.
  */
class HexPrefixLongSpec extends SparkSuite {
  import spark.implicits._

  test("agrees with conv(substring(…),16,10) on md5 digests for n=1..15") {
    val df = (1 to 300).map(i => s"tok$i").toDF("t")
      .select(md5(col("t")).as("h"))
    (1 to 15).foreach { n =>
      val bad = df.select(
          HexPrefixLong(col("h"), n).as("fast"),
          conv(substring(col("h"), 1, n), 16, 10).cast("long").as("ref"))
        .where(col("fast") =!= col("ref")).count()
      assert(bad == 0, s"n=$n diverges from conv+substring")
    }
  }

  test("short inputs parse the digits that exist") {
    val rows = Seq("", "f", "0a", "dead").toDF("h")
      .select(HexPrefixLong(col("h"), 8).as("v")).as[Long].collect()
    assert(rows.toSeq == Seq(0L, 15L, 10L, 0xdeadL))
  }

  test("parse stops at the first non-hex byte (conv behavior)") {
    val rows = Seq("12z45", "g", "AbCdEf").toDF("h")
      .select(HexPrefixLong(col("h"), 8).as("v")).as[Long].collect()
    assert(rows.toSeq == Seq(0x12L, 0L, 0xabcdefL))
  }

  test("interpreted eval matches the dataframe (codegen) path") {
    val h = "0123456789abcdef"
    val viaExpr = HexPrefixLong(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(h)), 12)
      .eval(null).asInstanceOf[Long]
    val viaDf = Seq(h).toDF("h")
      .select(HexPrefixLong(col("h"), 12).as("v")).as[Long].head()
    assert(viaExpr == viaDf)
    assert(viaExpr == java.lang.Long.parseLong(h.take(12), 16))
  }

  test("SQL surface via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val v = spark.sql("SELECT hex_prefix_long(md5('abc'), 8) AS v")
      .as[Long].head()
    val ref = spark.sql(
      "SELECT CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS v")
      .as[Long].head()
    assert(v == ref)
  }
}
