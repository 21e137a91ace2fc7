package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 15: the warehouse-OLAP family ("h" = headline).
  *
  * The reference's only real query engine is the warehouse it delegates to
  * (the embedded BigQuery SQL at `ingestdatainbigquery.py:84-96`); these
  * queries are the canonical warehouse-class analytical shapes (TPC-H
  * Q3/Q4/Q5/Q7/Q8/Q10/Q14/Q18, adapted to the testdata's schema — no
  * partsupp / commitdate / shipmode columns) run natively. They are the
  * multi-join, fact-scan-bound plans a 100 TB deployment actually spends
  * its time in, and the family the bench's scale argument leans on:
  * every plan is (broadcast dims) ⋈ (one or two shuffle-partitioned fact
  * joins) → partial-aggregated rollup, so cost is a single lineitem scan
  * plus shuffles bounded by the pre-aggregated/filtered row count.
  *
  * Determinism: money sums pre-rounded at the products' terminating
  * decimal precision (see a1_grouped_metrics); every top-k orders by the
  * ROUNDED measure with a unique-key tie-break, so the selected set is
  * engine-independent.
  */
object Extended15 {

  private val rev = "l_extendedprice * (1 - l_discount)"

  /** H1 — shipping-priority top-k (TPC-H Q3 shape): revenue of still-open
    * orders for one market segment, top 10 by revenue. Plan: customer
    * (segment-filtered, broadcast) ⋈ orders ⋈ lineitem; one shuffle join
    * on orderkey, aggregation partial-applied before the global top-k
    * (TakeOrderedAndProject — no full sort at scale). */
  val h1TopUnshipped = q("h1_shipping_priority",
    s"""SELECT l.l_orderkey, o.o_orderdate,
       |       ${rnd(rnd(s"sum($rev)", 4), 2)} AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = 'BUILDING'
       |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2
       |ORDER BY revenue DESC, l.l_orderkey ASC
       |LIMIT 10""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
        l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(round(sum("rev"), 4), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** H2 — regional supplier volume (TPC-H Q5 shape): revenue kept inside
    * one region, the year a customer bought from a same-nation supplier.
    * The c_nationkey = s_nationkey residual makes this the classic
    * broadcast-dim star with a co-location predicate: nation/region/
    * supplier broadcast; orders⋈lineitem is the only real shuffle. */
  val h2RegionalVolume = q("h2_regional_supplier_volume",
    s"""SELECT n.n_name AS nation, ${rnd(rnd(s"sum($rev)", 4), 2)} AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |                AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = 'ASIA'
       |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
    val dims = sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(dims),
        l("l_suppkey") === dims("s_suppkey") &&
          c("c_nationkey") === dims("s_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(round(round(sum("rev"), 4), 2).as("revenue"))
  }

  /** H3 — returned-item customer ranking (TPC-H Q10 shape): one quarter's
    * revenue lost to returns, attributed per customer, top 20. The
    * aggregation keys carry the customer payload columns (classic
    * "group by the whole dim row" warehouse idiom — no re-join after the
    * agg), and the top-k is again TakeOrderedAndProject on the rounded
    * measure. */
  val h3ReturnedCustomers = q("h3_returned_customers",
    s"""SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       |       ${rnd("c.c_acctbal", 2)} AS acctbal,
       |       ${rnd(rnd(s"sum($rev)", 4), 2)} AS lost_revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY lost_revenue DESC, c.c_custkey ASC
       |LIMIT 20""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c.join(broadcast(n),
          c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))),
        o("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .agg(round(round(sum("rev"), 4), 2).as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** H4 — promo revenue share (TPC-H Q14 shape): one month's revenue
    * fraction from promotional parts. The part dim broadcasts; the
    * conditional numerator and the total ride ONE aggregate pass (the
    * FILTER-clause idiom), and both sums are pre-rounded before the
    * division so the scalar ratio is engine-exact. */
  val h4PromoShare = q("h4_promo_share",
    s"""SELECT ${rnd(
           s"100.0 * ${rnd(s"sum(CASE WHEN p.p_type = 'PROMO' THEN $rev ELSE 0 END)", 4)}" +
           s" / ${rnd(s"sum($rev)", 4)}", 4)} AS promo_share
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).select("p_partkey", "p_type")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg((lit(100.0) *
          round(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0)), 4) /
          round(sum("rev"), 4)).as("raw"))
      .select(round(col("raw"), 4).as("promo_share"))
  }

  /** H5 — large-volume orders (TPC-H Q18 shape): orders whose total
    * quantity exceeds a threshold, with their customer, top 100 by order
    * value. The HAVING pre-aggregate shrinks the fact side to the few
    * qualifying orderkeys BEFORE any dim join touches it — the join
    * input is bounded by the selectivity of the threshold, not the scan. */
  val h5BigOrders = q("h5_large_volume_orders",
    s"""WITH big AS (
       |  SELECT l_orderkey, ${rnd("sum(l_quantity)", 2)} AS total_qty
       |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
       |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       |       ${rnd("o.o_totalprice", 2)} AS totalprice, b.total_qty
       |FROM big b
       |JOIN orders o ON b.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |ORDER BY totalprice DESC, o.o_orderkey ASC
       |LIMIT 100""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
      .where(col("q") > 300)
      .select(col("l_orderkey"), round(col("q"), 2).as("total_qty"))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("totalprice"),
        col("total_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** H6 — bilateral trade volume (TPC-H Q7 shape): shipped revenue
    * between two nations, both directions, by ship year. Supplier and
    * customer each resolve their nation via broadcast; the only shuffles
    * are lineitem⋈orders and orders⋈customer on their natural keys. */
  val h6BilateralVolume = q("h6_bilateral_volume",
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       |       ${rnd(rnd(s"sum($rev)", 4), 2)} AS volume
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
       |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, d).join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("ship_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(cust, o("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(round(round(sum("rev"), 4), 2).as("volume"))
  }

  /** H7 — market share (TPC-H Q8 shape): one nation's share of a
    * region's PROMO-part order volume per order year. Two pre-rounded
    * sums (conditional numerator / total) per year, divided after the
    * aggregate — the same one-pass FILTER idiom as h4, over the full
    * six-table star. */
  val h7MarketShare = q("h7_market_share",
    s"""SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
       |       ${rnd(
           s"${rnd(s"sum(CASE WHEN sn.n_name = 'NATION_5' THEN $rev ELSE 0 END)", 4)}" +
           s" / ${rnd(s"sum($rev)", 4)}", 6)} AS mkt_share
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |JOIN region r ON cn.n_regionkey = r.r_regionkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).where(col("p_type") === "PROMO")
      .select("p_partkey")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
    val cust = Tables.customer(s, d)
      .join(broadcast(n.join(broadcast(r),
          n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val sup = Tables.supplier(s, d).join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("order_year"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(cust, o("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .groupBy("order_year")
      .agg((round(sum(when(col("supp_nation") === "NATION_5", col("rev"))
          .otherwise(0)), 4) /
        round(sum("rev"), 4)).as("raw"))
      .select(col("order_year"), round(col("raw"), 6).as("mkt_share"))
  }

  /** H8 — order-priority late-shipment check (TPC-H Q4 shape): orders in
    * one quarter with at least one line shipped more than 120 days after
    * the order date, counted by priority. The EXISTS compiles to a
    * left-semi join on orderkey; the lineitem side carries only the key
    * after pushdown of the lateness predicate into the join condition. */
  val h8PriorityLate = q("h8_priority_late_orders",
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 120 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  val all: Seq[Q] = Seq(h1TopUnshipped, h2RegionalVolume, h3ReturnedCustomers,
    h4PromoShare, h5BigOrders, h6BilateralVolume, h7MarketShare, h8PriorityLate)
}
