package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 21: warehouse-OLAP family completed (h17–h22).
  *
  * The last TPC-H shapes missing after Extended15 + Extended20:
  * disjunctive multi-block predicates (Q19), nested semi-join supplier
  * selection (Q20), the multi-EXISTS "kept orders waiting" self-join
  * (Q21, decorrelated to per-order aggregates), scalar-subquery +
  * anti-join customer screen (Q22), per-group argmin supplier selection
  * (Q2's correlated min, decorrelated to a window), and the
  * profit-by-nation-and-year rollup (Q9). With these, every TPC-H query
  * shape expressible on this star (no partsupp table) has a native
  * implementation — the complete warehouse-delegated query class of the
  * reference (`ingestdatainbigquery.py:84-96`) plus everything around it.
  *
  * Q21's EXISTS/NOT-EXISTS pair is implemented the way a distributed
  * engine should: ONE aggregation over the order's lines computing
  * (distinct suppliers, distinct late suppliers, the late supplier id
  * when unique) — not two correlated self-joins of the fact against
  * itself. The oracle SQL uses the same decorrelated form, which is
  * semantically identical to the textbook EXISTS formulation.
  */
object Extended21 {

  private val rev = "l_extendedprice * (1 - l_discount)"

  /** H17 — disjunctive predicate revenue (TPC-H Q19 shape): three
    * (brand × size-band × quantity-band) OR-blocks. One scan; the whole
    * disjunction is a single codegen'd filter over the broadcast part
    * join — no union of three subqueries (the naive translation scans
    * the fact three times). */
  val h17DisjunctiveRevenue = q("h17_disjunctive_revenue",
    s"""SELECT ${rnd(rnd(s"sum($rev)", 4), 2)} AS revenue, count(*) AS n_lines
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       |       AND l.l_quantity BETWEEN 1 AND 11)
       |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25
       |       AND l.l_quantity BETWEEN 10 AND 20)
       |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
       |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(s, d).select(col("l_partkey"), col("l_quantity"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rv"))
    val block = (b: String, s0: Int, s1: Int, q0: Int, q1: Int) =>
      col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .where(block("Brand#12", 1, 15, 1, 11) ||
        block("Brand#23", 10, 25, 10, 20) ||
        block("Brand#34", 20, 50, 20, 30))
      .agg(round(round(sum("rv"), 4), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** H18 — excess-volume suppliers (TPC-H Q20 shape): suppliers that
    * shipped more than 60 units of some red part in 1996 — a nested
    * semi-join chain (part filter → per (supplier, part) quantity rollup
    * → HAVING → semi join into supplier). The rollup output is bounded by
    * |supplier|×|matching parts|, tiny next to the fact, and the final
    * membership check is a broadcast semi join. */
  val h18ExcessVolumeSuppliers = q("h18_excess_volume_suppliers",
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_name LIKE 'red %'
      |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l.l_suppkey, l.l_partkey
      |  HAVING sum(l.l_quantity) > 60)""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).where(col("p_name").like("red %"))
      .select("p_partkey")
    val vol = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_suppkey", "l_partkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("qty"))
      .where(col("qty") > 60)
      .select("l_suppkey").distinct()
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    sup.join(broadcast(vol), sup("s_suppkey") === vol("l_suppkey"), "left_semi")
  }

  /** H19 — suppliers who kept orders waiting (TPC-H Q21 shape): for
    * finished multi-supplier orders where EXACTLY ONE supplier shipped
    * late (>90 days after order), blame that supplier; rank by waits.
    * Decorrelated: one groupBy(order) computes n distinct suppliers,
    * n distinct LATE suppliers, and (via conditional min=max) the unique
    * late supplier — replacing both correlated EXISTS self-joins with a
    * single shuffle bounded by |orders|. */
  val h19WaitingSuppliers = q("h19_waiting_suppliers",
    """WITH per_order AS (
      |  SELECT l.l_orderkey,
      |         count(DISTINCT l.l_suppkey) AS n_supp,
      |         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |                             THEN l.l_suppkey END) AS n_late,
      |         min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |                  THEN l.l_suppkey END) AS late_supp
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY 1)
      |SELECT s.s_name, count(*) AS numwait
      |FROM per_order po JOIN supplier s ON po.late_supp = s.s_suppkey
      |WHERE po.n_supp > 1 AND po.n_late = 1
      |GROUP BY 1
      |ORDER BY numwait DESC, s.s_name ASC
      |LIMIT 20""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val perOrder = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late"),
        min(when(late, col("l_suppkey"))).as("late_supp"))
      .where(col("n_supp") > 1 && col("n_late") === 1)
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    perOrder.join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** H20 — idle rich customers (TPC-H Q22 shape): customers above the
    * average positive balance with no orders since 1999, rolled up by
    * market segment. The average is a broadcast one-row scalar; "no
    * recent orders" is a broadcast anti join against the distinct
    * recent-customer set (never NOT IN at scale — NULL semantics and a
    * shuffled subquery both bite). */
  val h20IdleRichCustomers = q("h20_idle_rich_customers",
    s"""WITH recent AS (
       |  SELECT DISTINCT o_custkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'),
       |thr AS (
       |  SELECT ${rnd("sum(c_acctbal) / count(*)", 6)} AS avg_bal
       |  FROM customer WHERE c_acctbal > 0.0)
       |SELECT c.c_mktsegment, count(*) AS numcust,
       |       ${rnd(rnd("sum(c.c_acctbal)", 4), 2)} AS totacctbal
       |FROM customer c, thr
       |WHERE c.c_acctbal > thr.avg_bal
       |  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val recent = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val c = Tables.customer(s, d)
    val thr = c.where(col("c_acctbal") > 0.0)
      .agg(round(sum("c_acctbal") / count(lit(1)), 6).as("avg_bal"))
    c.select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(thr))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(broadcast(recent), col("c_custkey") === recent("o_custkey"),
        "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        round(round(sum("c_acctbal"), 4), 2).as("totacctbal"))
  }

  /** H21 — cheapest supplier per part (TPC-H Q2's correlated min,
    * decorrelated): per (part, supplier) the minimum observed unit price,
    * then the per-part argmin via ROW_NUMBER over (price, suppkey) — the
    * window runs over the pre-aggregated (part × supplier) rollup, not
    * the fact. Unit price is one double division of identical inputs in
    * both engines, so min/tie-break order is engine-independent. */
  val h21CheapestSupplier = q("h21_cheapest_supplier",
    s"""WITH unit AS (
       |  SELECT l_partkey, l_suppkey,
       |         min(l_extendedprice / l_quantity) AS unit_price
       |  FROM lineitem GROUP BY 1, 2),
       |ranked AS (
       |  SELECT l_partkey, l_suppkey, unit_price,
       |         row_number() OVER (PARTITION BY l_partkey
       |                            ORDER BY unit_price ASC, l_suppkey ASC) AS rn
       |  FROM unit)
       |SELECT r.l_partkey, s.s_name, ${rnd("r.unit_price", 4)} AS best_price
       |FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
       |WHERE r.rn = 1""".stripMargin) { (s, d) =>
    val unit = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("up"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("up").as("unit_price"))
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("unit_price").asc, col("l_suppkey").asc)
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    unit.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_name"),
        round(col("unit_price"), 4).as("best_price"))
  }

  /** H22 — product-type profit by nation and year (TPC-H Q9 shape;
    * 10% of retail price stands in for the missing ps_supplycost):
    * profit = revenue − qty·cost, grouped by supplier nation × order
    * year. Fact joins: one shuffle on orderkey (for the year); part,
    * supplier, nation all broadcast. Profit terms terminate at 4
    * decimals, so the usual round-at-4-then-2 applies. */
  val h22ProductProfit = q("h22_product_profit",
    s"""SELECT n.n_name AS nation,
       |       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       |       ${rnd(rnd(s"sum($rev - l_quantity * p.p_retailprice * 0.1)", 4), 2)}
       |         AS profit
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |WHERE p.p_name LIKE 'red %'
       |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).where(col("p_name").like("red %"))
      .select("p_partkey", "p_retailprice")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("l_quantity") * col("p_retailprice") * 0.1
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(round(sum(profit), 4), 2).as("profit"))
  }

  val all: Seq[Q] = Seq(h17DisjunctiveRevenue, h18ExcessVolumeSuppliers,
    h19WaitingSuppliers, h20IdleRichCustomers, h21CheapestSupplier,
    h22ProductProfit)
}
