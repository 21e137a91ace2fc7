package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Merge}

/** Relational operator battery — every scan/join/agg/window/set op from
  * SURVEY.md §2 (S1–S8, P1–P7, J1–J8, A1–A4, W1–W5, U1–U2) re-expressed
  * over the driver testdata, each with a DuckDB oracle.
  *
  * Scale notes are per-query in scaladoc: broadcast for dims, single
  * shuffle for aggs/windows, AQE handles skew. Plans verified via
  * .explain("formatted") — filters/projections reach the parquet scan.
  */
object Relational {

  /** S1/S8 — dim scan: trim + null guard + projection, pushdown-friendly. */
  val s1DimScan = q("s1_dim_scan",
    """SELECT n_nationkey, trim(n_name) AS n_name, n_regionkey
      |FROM nation WHERE n_name IS NOT NULL""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .where(col("n_name").isNotNull)
      .select(col("n_nationkey"), trim(col("n_name")).as("n_name"), col("n_regionkey"))
  }

  /** S2/P4/W3 — source scan with pushed-down predicates (date window +
    * value filter) and sort-ready output. `.explain` shows PushedFilters
    * on both columns and ReadSchema of exactly 4 columns. */
  val s2Pushdown = q("s2_pushdown_scan",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       strftime(l_shipdate::TIMESTAMP, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
  }

  /** S5/S6/P1/P3 — column-projection scan (Catalyst prunes to 2 cols). */
  val s5Projection = q("s5_projection",
    """SELECT o_orderkey, strftime(o_orderdate::TIMESTAMP, '%Y-%m-%d') AS order_date
      |FROM orders WHERE o_orderkey IS NOT NULL""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .where(col("o_orderkey").isNotNull)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
  }

  /** J1 — broadcast left join with miss-default (ref: "Unknown Channel",
    * dataingestion1.py:133). Small side broadcast ⇒ no shuffle of facts. */
  val j1LeftJoin = q("j1_left_join_default",
    """SELECT o.o_orderkey, o.o_custkey,
      |       coalesce(c.c_name, 'unknown customer') AS customer_name,
      |       coalesce(c.c_mktsegment, '') AS segment
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(o("o_orderkey"), o("o_custkey"),
        coalesce(col("c_name"), lit("unknown customer")).as("customer_name"),
        coalesce(col("c_mktsegment"), lit("")).as("segment"))
  }

  /** J2/J3 — multi-hop dim join with 3 payload columns (ref show join,
    * dataingestion3.py:43-45); both dims broadcast. */
  val j3MultiHop = q("j3_multihop_dim_join",
    """SELECT c.c_custkey, c.c_name,
      |       coalesce(n.n_name, '') AS nation_name,
      |       coalesce(r.r_name, '') AS region_name
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(c("c_custkey"), c("c_name"),
        coalesce(n("n_name"), lit("")).as("nation_name"),
        coalesce(r("r_name"), lit("")).as("region_name"))
  }

  /** J4/F18 — conditional lookup: the CPM-category rule
    * (dataprocessing3.py:88-91) — bypass the joined value for one class. */
  val j4Conditional = q("j4_conditional_lookup",
    """SELECT c.c_custkey,
      |       CASE WHEN c.c_mktsegment = 'BUILDING' THEN c.c_name
      |            ELSE coalesce(n.n_name, '') END AS resolved
      |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(c("c_custkey"),
        when(c("c_mktsegment") === "BUILDING", c("c_name"))
          .otherwise(coalesce(n("n_name"), lit(""))).as("resolved"))
  }

  /** J5/K4 — keyed upsert-merge (metrics scatter-update,
    * dataprocessing.py:136-158): left join + coalesce(new, old). */
  val j5Upsert = q("j5_upsert_merge",
    s"""SELECT o.o_orderkey,
      |       ${rnd("coalesce(u.computed_price, o.o_totalprice)", 2)} AS o_totalprice,
      |       CAST(coalesce(u.n_lines, 0) AS BIGINT) AS n_lines,
      |       o.o_orderstatus
      |FROM orders o LEFT JOIN (
      |  SELECT l_orderkey,
      |         ${rnd(rnd("sum(l_extendedprice * (1 - l_discount))", 4), 2)} AS computed_price,
      |         count(*) AS n_lines
      |  FROM lineitem GROUP BY l_orderkey) u ON o.o_orderkey = u.l_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val updates = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      // 4dp pre-round: see a1_grouped_metrics comment
      .agg(round(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4), 2)
        .as("o_totalprice"),
        count(lit(1)).as("n_lines"))
    val merged = Merge.upsertColumns(base, updates, "o_orderkey")
    merged.select(col("o_orderkey"),
      round(col("o_totalprice"), 2).as("o_totalprice"),
      coalesce(col("n_lines"), lit(0L)).as("n_lines"),
      col("o_orderstatus"))
  }

  /** J6/U2 — anti join (remaining-ids loop, dataprocessing.py:106-114):
    * customers with no high-value order. */
  val j6Anti = q("j6_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).where(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** P5 — membership filter as semi join (isin over a 500-id batch,
    * dataprocessing.py:91): planned as a broadcast semi join. */
  val p5Semi = q("p5_semi_membership",
    s"""SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       ${rnd("sum(l.l_extendedprice)", 2)} AS total_price
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 450000)
      |GROUP BY l.l_returnflag""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val ids = Tables.orders(s, d).where(col("o_totalprice") > 450000)
      .select(col("o_orderkey"))
    l.join(ids, l("l_orderkey") === ids("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
  }

  /** A1 — the 10-metric grouped aggregate (analytics groupBy,
    * dataprocessing.py:89-90) — flagship TPC-H-Q1 shape. Partial (map-side)
    * aggregation + single shuffle on the group keys. */
  val a1Grouped = q("a1_grouped_metrics",
    s"""SELECT l_returnflag, l_linestatus,
      |       ${rnd("sum(l_quantity)", 2)} AS sum_qty,
      |       ${rnd("sum(l_extendedprice)", 2)} AS sum_base_price,
      |       ${rnd(rnd("sum(l_extendedprice * (1 - l_discount))", 4), 2)} AS sum_disc_price,
      |       ${rnd(rnd("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 6), 2)} AS sum_charge,
      |       ${rnd("avg(l_quantity)", 4)} AS avg_qty,
      |       ${rnd("avg(l_extendedprice)", 4)} AS avg_price,
      |       ${rnd("avg(l_discount)", 4)} AS avg_disc,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        // pre-round at the products' terminating decimal precision (4dp /
        // 6dp): engine-dependent FP summation order perturbs the sum by
        // ~1e-9, and a true sum landing exactly on a .xx5 boundary would
        // otherwise round differently per engine (seen at sf0.1).
        round(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4), 2).as("sum_disc_price"),
        round(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 6), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** A2/A3 — min/max/count global aggregate (min upload date,
    * dataprocessing.py:87). */
  val a2MinMax = q("a2_minmax",
    s"""SELECT strftime(min(o_orderdate)::TIMESTAMP, '%Y-%m-%d') AS min_date,
      |       strftime(max(o_orderdate)::TIMESTAMP, '%Y-%m-%d') AS max_date,
      |       ${rnd("min(o_totalprice)", 2)} AS min_price,
      |       ${rnd("max(o_totalprice)", 2)} AS max_price,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg(
      date_format(min("o_orderdate"), "yyyy-MM-dd").as("min_date"),
      date_format(max("o_orderdate"), "yyyy-MM-dd").as("max_date"),
      round(min("o_totalprice"), 2).as("min_price"),
      round(max("o_totalprice"), 2).as("max_price"),
      count(lit(1)).as("n"))
  }

  /** A4 — distinct projection (fetched-id set, dataprocessing.py:112). */
  val a4Distinct = q("a4_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, d) =>
    Tables.customer(s, d).select("c_mktsegment", "c_nationkey").distinct()
  }

  /** A5 — statistical profile per group (beyond-reference: exact stats the
    * pandas profile would need; median/stddev exercise sort-based agg). */
  val a5Stats = q("a5_group_stats",
    s"""SELECT l_returnflag,
      |       ${rnd("avg(l_quantity)", 4)} AS avg_qty,
      |       ${rnd("stddev_samp(l_quantity)", 4)} AS sd_qty,
      |       ${rnd("median(l_quantity)", 2)} AS med_qty,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       ${rnd("min(l_quantity)", 2)} AS min_qty,
      |       ${rnd("max(l_quantity)", 2)} AS max_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      round(avg("l_quantity"), 4).as("avg_qty"),
      round(stddev_samp("l_quantity"), 4).as("sd_qty"),
      round(median(col("l_quantity")), 2).as("med_qty"),
      countDistinct("l_partkey").as("n_parts"),
      round(min("l_quantity"), 2).as("min_qty"),
      round(max("l_quantity"), 2).as("max_qty"))
  }

  /** W1 — keep-last dedup with explicit ordering (merge-upsert survivor,
    * dataingestion1.py:166-168): last event per user. */
  val w1KeepLast = q("w1_keeplast_dedup",
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
    Dedup.keepLast(Tables.events(s, d), "user_id", col("ts"), col("event_id"))
      .select("user_id", "event_id", "event_type")
  }

  /** W2 — warehouse-style window dedup (ROW_NUMBER … WHERE rn=1,
    * ingestdatainbigquery.py:84-96) with a DETERMINISTIC order key. */
  val w2WindowDedup = q("w2_window_dedup",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |         row_number() OVER (PARTITION BY l_orderkey
      |                            ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin) { (s, d) =>
    // (l_orderkey, l_linenumber) is NOT unique in this data — tiebreak on
    // the remaining output column for a deterministic survivor.
    Dedup.keepFirstBy(Tables.lineitem(s, d), Seq("l_orderkey"),
      Seq(col("l_linenumber").desc, col("l_quantity").desc))
      .select("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** W4 — top-k (sort:-views maxResults:500, dataprocessing.py:92-93);
    * Spark plans TakeOrderedAndProject — no global sort. */
  val w4TopK = q("w4_topk",
    s"""SELECT o_orderkey, ${rnd("o_totalprice", 2)} AS o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 500""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(500)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
  }

  /** U1+W1 — union of overlapping slices + dedup (existing ∪ new,
    * dataingestion1.py:166). */
  val u1UnionDedup = q("u1_union_dedup",
    """SELECT DISTINCT o_orderkey, o_orderstatus FROM (
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 300000
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '2000-01-01')""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.where(col("o_totalprice") > 300000).select("o_orderkey", "o_orderstatus")
    val b = o.where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderstatus")
    a.unionByName(b).distinct()
  }

  /** W5 — running-total window per key (beyond-reference analytics shape;
    * single shuffle on the partition key). */
  val w5Running = q("w5_running_window",
    s"""SELECT o_custkey, o_orderkey,
      |       ${rnd("""sum(o_totalprice) OVER (
      |         PARTITION BY o_custkey
      |         ORDER BY o_orderdate ASC, o_orderkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""", 2)} AS running_total
      |FROM orders""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(w), 2).as("running_total"))
  }

  /** W2 via the SQL surface — the one statement the reference delegates
    * to a real engine (BigQuery, ingestdatainbigquery.py:84-96) runs
    * natively through spark.sql over a temp view: latest order per
    * customer, deterministic order key substituted for the reference's
    * nondeterministic ORDER BY CURRENT_TIMESTAMP(). */
  val sqlWindowDedup = q("sql_window_dedup",
    """SELECT o_custkey, o_orderkey,
      |       strftime(o_orderdate::TIMESTAMP, '%Y-%m-%d') AS latest_date
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |       date_format(o_orderdate, 'yyyy-MM-dd') AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders_v)
        |WHERE rn = 1""".stripMargin)
  }

  /** A6 — hierarchical rollup (beyond-reference: the dashboard the
    * reference feeds would ask for exactly this subtotal structure).
    * grouping_id distinguishes subtotal levels; keys coalesced to ''
    * for engine-portable output. */
  val a6Rollup = q("a6_rollup",
    s"""SELECT coalesce(l_returnflag, '') AS returnflag,
      |       coalesce(l_linestatus, '') AS linestatus,
      |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |       ${rnd("sum(l_quantity)", 2)} AS sum_qty,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n"))
  }

  /** U3 — intersect (set semantics; beyond-reference completeness). */
  val u2Intersect = q("u2_intersect",
    """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.where(col("o_totalprice") > 300000).select("o_custkey")
      .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey"))
  }

  /** A7 — full cube over two dimensions (all 4 subtotal levels). */
  val a7Cube = q("a7_cube",
    s"""SELECT coalesce(o_orderstatus, '') AS status,
      |       coalesce(o_orderpriority, '') AS priority,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |       ${rnd("sum(o_totalprice)", 2)} AS total,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("gid"),
        round(sum("o_totalprice"), 2).as("total"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("")).as("status"),
        coalesce(col("o_orderpriority"), lit("")).as("priority"),
        col("gid"), col("total"), col("n"))
  }

  /** A8 — approximate sketches (HLL distinct, approx quantiles): the
    * 100 TB substitutes for exact countDistinct/median. Sketch VALUES are
    * engine-specific, so the hashable output carries the exact answers
    * plus booleans asserting each sketch landed inside its published
    * error bound (HLL rsd 5% → 3σ = 15%; approx-percentile accuracy 1000
    * → rank error 1/1000, checked against the exact 0.49/0.51 quantile
    * envelope). The oracle recomputes the exact answers and expects every
    * bound-check true — a hard hash gate on the sketch behavior without
    * hashing sketch internals. ApproxSpec asserts the tighter 1σ bound. */
  val a8Approx = q("a8_approx_sketches",
    """SELECT l_returnflag,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |       true AS distinct_ok, true AS median_ok
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx_med"),
      expr("percentile(l_quantity, 0.49)").as("q_lo"),
      expr("percentile(l_quantity, 0.51)").as("q_hi"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * lit(0.15)).as("distinct_ok"),
        (col("approx_med") >= col("q_lo") &&
          col("approx_med") <= col("q_hi")).as("median_ok"))
  }

  /** W6 — the ranking/offset window family over one pass: rank,
    * dense_rank, ntile, lag, lead with a total order. */
  val w6Ranking = q("w6_ranking_family",
    s"""SELECT o_custkey, o_orderkey,
      |       CAST(rank() OVER w AS INT) AS rnk,
      |       CAST(dense_rank() OVER w AS INT) AS drnk,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       lag(o_orderkey, 1) OVER w AS prev_order,
      |       lead(o_orderkey, 1) OVER w AS next_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      lag("o_orderkey", 1).over(w).as("prev_order"),
      lead("o_orderkey", 1).over(w).as("next_order"))
  }

  val all: Seq[Q] = Seq(s1DimScan, s2Pushdown, s5Projection, j1LeftJoin,
    j3MultiHop, j4Conditional, j5Upsert, j6Anti, p5Semi, a1Grouped, a2MinMax,
    a4Distinct, a5Stats, a6Rollup, a7Cube, a8Approx, w1KeepLast,
    w2WindowDedup, w4TopK, u1UnionDedup, u2Intersect, w5Running, w6Ranking,
    sqlWindowDedup)
}
