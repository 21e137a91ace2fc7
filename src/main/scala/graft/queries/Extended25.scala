package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TopK

/** Round-2 widening, part 25: queries exercising the native custom
  * physical operator (graft.plans.TopKPerGroup — logical node + planner
  * Strategy + partial/final SparkPlan pair). */
object Extended25 {

  /** W14 — top-k per group through the NATIVE operator: top-3 lines per
    * (returnflag, linestatus) by price. Unlike w11's window formulation
    * (which shuffles every row and sorts whole partitions), this plans as
    * PartialTopKPerGroup → Exchange → FinalTopKPerGroup: the exchange
    * carries at most k rows per key per upstream partition. The oracle is
    * the window formulation — semantically identical on this total
    * order. */
  val w14NativeTopK = q("w14_native_topk",
    """SELECT l_returnflag, l_linestatus, l_extendedprice, l_orderkey,
      |       l_linenumber
      |FROM (SELECT l_returnflag, l_linestatus, l_extendedprice, l_orderkey,
      |             l_linenumber,
      |             row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |                                ORDER BY l_extendedprice DESC,
      |                                         l_orderkey ASC,
      |                                         l_linenumber ASC) AS rn
      |      FROM lineitem)
      |WHERE rn <= 3""".stripMargin) { (s, d) =>
    TopK.perGroup(
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus",
        "l_extendedprice", "l_orderkey", "l_linenumber"),
      keys = Seq("l_returnflag", "l_linestatus"),
      order = Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true),
      k = 3)
  }

  val all: Seq[Q] = Seq(w14NativeTopK)
}
