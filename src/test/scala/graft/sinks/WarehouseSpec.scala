package graft.sinks

import graft.SparkSuite

class WarehouseSpec extends SparkSuite {

  test("F19 identifier sanitize matches reference regex semantics") {
    val cases = Map(
      "  O Order-Key! " -> "o_order_key",
      "Total Price" -> "total_price",
      "Order  Date" -> "order_date",
      "__already__ok__" -> "already_ok",
      "Views (P)" -> "views_p")
    cases.foreach { case (in, want) =>
      assert(Warehouse.sanitizeName(in) == want, s"sanitize($in)")
    }
  }

  test("allString casts every column to string") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "x")).toDF("a", "b", "c")
    assert(Warehouse.allString(df).schema.forall(_.dataType.typeName == "string"))
  }

  test("partitioned append: filters prune partitions at planning time") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("wh_part").toString + "/wh"
    val df = (1 to 300).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 3 + 1)}", i * 1.0))
      .toDF("id", "load_date", "v")
    Warehouse.appendPartitioned(df, dir, Seq("load_date"))
    // layout: one directory per load_date value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("load_date=2024-01-01", "load_date=2024-01-02", "load_date=2024-01-03"))
    val q = spark.read.parquet(dir).where(col("load_date") === "2024-01-02")
    val scan = q.queryExecution.sparkPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(load_date"), scan)
    assert(q.count() == 100)
    // the pruned scan must plan over exactly one partition directory
    val files = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!files.contains("load_date=2024-01-01"))
  }
}
