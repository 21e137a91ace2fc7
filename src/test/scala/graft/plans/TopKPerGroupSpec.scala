package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** The native top-k-per-group operator: window-formulation equivalence,
  * partitioning independence, the two-phase physical plan, and the edge
  * cases (k ≥ group size, global top-k with no keys). */
class TopKPerGroupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def li = Tables.lineitem(spark, sf)
    .select("l_returnflag", "l_linestatus", "l_extendedprice",
      "l_orderkey", "l_linenumber")

  private val orderCols = Seq(col("l_extendedprice").desc,
    col("l_orderkey").asc, col("l_linenumber").asc)

  private val orderSpec = Seq("l_extendedprice" -> false,
    "l_orderkey" -> true, "l_linenumber" -> true)

  private def windowed(k: Int) = {
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(orderCols: _*)
    li.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .drop("rn")
  }

  test("matches the window formulation exactly") {
    val native = TopK.perGroup(li,
      Seq("l_returnflag", "l_linestatus"), orderSpec, 3)
    val expected = windowed(3).collect().map(_.toSeq).sortBy(_.toString)
    val got = native.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }

  test("result is independent of the input partitioning") {
    val a = TopK.perGroup(li.repartition(7),
      Seq("l_returnflag", "l_linestatus"), orderSpec, 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = TopK.perGroup(li.coalesce(1),
      Seq("l_returnflag", "l_linestatus"), orderSpec, 5)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("plans as Partial → Exchange → Final; shuffle carries only survivors") {
    val native = TopK.perGroup(li,
      Seq("l_returnflag", "l_linestatus"), orderSpec, 3)
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("PartialTopKPerGroup"), p)
    assert(p.contains("FinalTopKPerGroup"), p)
    val exIdx = p.indexOf("Exchange")
    assert(exIdx >= 0 && exIdx > p.indexOf("FinalTopKPerGroup") &&
      exIdx < p.indexOf("PartialTopKPerGroup"),
      "exchange not between the two phases:\n" + p)
  }

  test("k beyond the group size returns the whole group, ordered") {
    val one = li.where(col("l_returnflag") === "R").limit(4)
    val native = TopK.perGroup(one, Seq("l_returnflag"), orderSpec, 1000)
    assert(native.count() == one.count())
  }

  test("no keys → global top-k") {
    val native = TopK.perGroup(li, Seq.empty, orderSpec, 7)
    val expected = li.orderBy(orderCols: _*).limit(7)
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = native.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.sameElements(expected))
  }
}
