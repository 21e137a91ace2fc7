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
}
