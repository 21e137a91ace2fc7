package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 20: warehouse-OLAP family continued (h9–h16).
  *
  * Completes the TPC-H sweep started in Extended15 (Q3/Q4/Q5/Q7/Q8/Q10/
  * Q14/Q18 there) with the Q1/Q6/Q11/Q12/Q13/Q15/Q16/Q17 shapes, again
  * adapted to the testdata star (no partsupp / shipmode / container
  * columns — the nearest available attribute stands in; the reference's
  * warehouse-delegated query class, `ingestdatainbigquery.py:84-96`, run
  * natively). Shapes this batch adds that Extended15 didn't have:
  * full-scan wide aggregate (Q1), scan-only filter aggregate with total
  * pushdown (Q6), scalar-subquery HAVING threshold (Q11), left-join
  * count distribution — an aggregate OF an aggregate (Q13), equality-
  * with-global-max selection (Q15), anti-join + COUNT DISTINCT grouping
  * (Q16), and correlated per-group average threshold (Q17).
  *
  * Determinism: money terms terminate at ≤4 decimals (2-decimal price ×
  * 2-decimal rate), so round-at-4-then-2 recovers the exact decimal sum
  * (see Extended15 scaladoc); averages are formed as exact-integer or
  * terminating sums divided once, then rounded through the shared
  * `rnd` VARCHAR→DECIMAL route so both engines round the same number.
  */
object Extended20 {

  private val rev = "l_extendedprice * (1 - l_discount)"

  /** H9 — pricing summary report (TPC-H Q1 shape): the canonical
    * full-fact-scan wide aggregate — 8 measures over 6 groups, one scan,
    * one tiny shuffle of partial aggregates. At 100 TB this plan is
    * map-side partial aggregation into a 6-row exchange: the shuffle
    * carries ~nothing; cost is the (column-pruned) scan itself. */
  val h9PricingSummary = q("h9_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |       sum(l_quantity) AS sum_qty,
       |       ${rnd(rnd("sum(l_extendedprice)", 4), 2)} AS sum_base,
       |       ${rnd(rnd(s"sum($rev)", 4), 2)} AS sum_disc,
       |       ${rnd(rnd(s"sum($rev * (1 + l_tax))", 4), 2)} AS sum_charge,
       |       ${rnd("sum(l_quantity) / count(*)", 6)} AS avg_qty,
       |       ${rnd("sum(l_extendedprice) / count(*)", 6)} AS avg_price,
       |       ${rnd("sum(l_discount) / count(*)", 6)} AS avg_disc,
       |       count(*) AS n
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val revC = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(round(sum("l_extendedprice"), 4), 2).as("sum_base"),
        round(round(sum(revC), 4), 2).as("sum_disc"),
        round(round(sum(revC * (lit(1) + col("l_tax"))), 4), 2).as("sum_charge"),
        round(sum("l_quantity") / count(lit(1)), 6).as("avg_qty"),
        round(sum("l_extendedprice") / count(lit(1)), 6).as("avg_price"),
        round(sum("l_discount") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("n"))
  }

  /** H10 — forecast revenue change (TPC-H Q6 shape): scan-only filter
    * aggregate, zero joins. Every predicate (date range, discount band,
    * quantity cap) reaches the parquet scan as a pushed filter + row-group
    * stats prune; the "plan" is one partial-agg pipeline per split and a
    * single-row exchange — the cheapest possible 100 TB query. */
  val h10ForecastRevenue = q("h10_forecast_revenue",
    s"""SELECT ${rnd(rnd("sum(l_extendedprice * l_discount)", 4), 2)} AS revenue,
       |       count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(round(sum(col("l_extendedprice") * col("l_discount")), 4), 2)
        .as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** H11 — late-shipment priority split (TPC-H Q12 shape; l_linestatus
    * stands in for shipmode): lines shipped >60 days after their order,
    * counted by line status with an urgent/non-urgent conditional split.
    * The date-arithmetic predicate is a per-row comparison of two columns
    * — evaluated inside the join's stream side, no extra pass. */
  val h11LatePrioritySplit = q("h11_late_priority_split",
    """SELECT l.l_linestatus,
      |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_linestatus", "l_shipdate")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(urgent, 1).otherwise(0)).as("high_line_count"),
        sum(when(!urgent, 1).otherwise(0)).as("low_line_count"))
  }

  /** H12 — customer order-count distribution (TPC-H Q13 shape): an
    * aggregate OF an aggregate. Left join so zero-order customers appear
    * as c_count=0, with the order filter INSIDE the join condition (a
    * WHERE would silently turn the left join inner — the classic Q13
    * trap). Two shuffles: custkey (bounded by |customer|), then c_count
    * (bounded by the distinct count values, ~tens of rows). */
  val h12CustOrderDist = q("h12_cust_order_dist",
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |      FROM customer c
      |      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |                        AND o.o_orderpriority <> '1-URGENT'
      |      GROUP BY 1)
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderpriority")
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** H13 — important parts by revenue share (TPC-H Q11 shape): per-part
    * revenue kept only where it exceeds a fraction of TOTAL revenue — a
    * scalar-subquery HAVING. The global total is a one-row aggregate
    * broadcast into the filter (BroadcastNestedLoopJoin of a single row —
    * free); the fact is scanned twice, but both scans are column-pruned
    * partial aggregations, so at 100 TB this is two cheap passes rather
    * than one pass + a driver collect. Both sides of the comparison are
    * snapped at 4 decimals (terminating precision) before the strict >,
    * making the selected set engine-independent. The threshold is a
    * multiple of the MEAN per-part revenue (not a fixed fraction of
    * total), so the selected set stays meaningful at every scale
    * factor — a fraction-of-total cut empties as |part| grows. */
  val h13ImportantParts = q("h13_important_parts",
    s"""SELECT l_partkey, ${rnd(rnd(s"sum($rev)", 4), 2)} AS part_value
       |FROM lineitem
       |GROUP BY 1
       |HAVING ${rnd(s"sum($rev)", 4)} >
       |       (SELECT ${rnd(s"sum($rev)", 4)} * 1.6e0 / count(DISTINCT l_partkey)
       |        FROM lineitem)""".stripMargin) { (s, d) =>
    val revC = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), revC.as("rev"))
    val total = li.agg((round(sum("rev"), 4) * 1.6 /
      countDistinct("l_partkey")).as("thr"))
    li.groupBy("l_partkey")
      .agg(round(sum("rev"), 4).as("pv"))
      .crossJoin(broadcast(total))
      .where(col("pv") > col("thr"))
      .select(col("l_partkey"), round(col("pv"), 2).as("part_value"))
  }

  /** H14 — top supplier (TPC-H Q15 shape): one quarter's revenue per
    * supplier, keeping the supplier(s) that hit the GLOBAL max — equality
    * against a broadcast one-row aggregate over the rounded measure
    * (identical doubles in both engines, so the tie set is exact). The
    * revenue CTE is computed once per branch but each branch is the same
    * partial-agg scan; no window over the whole supplier set. */
  val h14TopSupplier = q("h14_top_supplier",
    s"""WITH r AS (
       |  SELECT l_suppkey, ${rnd(rnd(s"sum($rev)", 4), 2)} AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY 1)
       |SELECT s.s_suppkey, s.s_name, r.total_rev
       |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
       |WHERE r.total_rev = (SELECT max(total_rev) FROM r)""".stripMargin) { (s, d) =>
    val revC = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val r = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(round(sum(revC), 4), 2).as("total_rev"))
    val mx = r.agg(max("total_rev").as("mx"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
    r.crossJoin(broadcast(mx))
      .where(col("total_rev") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_rev")
  }

  /** H15 — small-quantity-order revenue (TPC-H Q17 shape): the correlated
    * per-group average, decorrelated the way every warehouse engine does
    * it — pre-aggregate avg quantity per part (exact integer sums, one
    * division), join it back, keep lines under half their part's average.
    * The per-part aggregate is tiny (|part| rows) and broadcast; the fact
    * is scanned once. */
  val h15SmallQtyRevenue = q("h15_small_qty_revenue",
    s"""SELECT ${rnd(rnd("sum(l.l_extendedprice)", 4), 2) } AS avg_weekly,
       |       count(*) AS n_lines
       |FROM lineitem l
       |JOIN (SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
       |      FROM lineitem GROUP BY 1) pa
       |  ON l.l_partkey = pa.l_partkey
       |WHERE l.l_quantity < 0.5 * pa.avg_qty""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val pa = li.groupBy("l_partkey")
      .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
    li.join(broadcast(pa), Seq("l_partkey"))
      .where(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(round(sum("l_extendedprice"), 4), 2).as("avg_weekly"),
        count(lit(1)).as("n_lines"))
  }

  /** H16 — supplier diversity per part attribute (TPC-H Q16 shape):
    * COUNT(DISTINCT suppkey) per (brand, size) over shipped lines,
    * excluding one brand and any supplier in bad standing — the NOT IN
    * subquery expressed as a broadcast anti join (never a shuffled NOT IN
    * at scale: NULL-safe anti semantics + a 100-row exclusion list are
    * exactly what broadcast anti joins are for). */
  val h16SupplierDiversity = q("h16_supplier_diversity",
    """SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#1'
      |  AND p.p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
      |  AND l.l_suppkey NOT IN
      |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val bad = Tables.supplier(s, d).where(col("s_acctbal") < 0)
      .select("s_suppkey")
    val p = Tables.part(s, d)
      .where(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50))
      .select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(bad), col("l_suppkey") === bad("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
  }

  val all: Seq[Q] = Seq(h9PricingSummary, h10ForecastRevenue,
    h11LatePrioritySplit, h12CustOrderDist, h13ImportantParts,
    h14TopSupplier, h15SmallQtyRevenue, h16SupplierDiversity)
}
