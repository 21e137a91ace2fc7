package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 18: the second composed flagship (the
  * reference's analytics epoch, stages 4–7, as ONE declarative plan) and
  * family completions — bag intersect, boolean aggregates, SQL-surface
  * GROUPING SETS, and the column-profiling operator.
  */
object Extended18 {

  /** C2 — composed analytics epoch: the reference's stages 4→7
    * (metrics pull → keyed update → derivations → warehouse load) as one
    * Catalyst plan with no inter-stage materialization. One epoch window
    * of events (the "analytics API" scan, P4 pushdown) is aggregated per
    * (user, day) (A1's grouped-metrics shape), derived rates added (F15),
    * the staging table's keep-last upsert retains each user's LATEST day
    * (W1), and the result is projected through the warehouse edge:
    * sanitized identifiers + all-string casts (F19/F20).
    *
    * The reference runs these as four processes with a spreadsheet
    * between each pair (`dataprocessing.py` → `ingestdatainbigquery.py`);
    * here the whole epoch is one plan: scan-filtered parquet → one keyed
    * shuffle (user,day agg) → one window (keep-last) → projection. At
    * 100 TB the intermediate "sheets" never exist.
    *
    * Determinism: day truncation + integer counts; rates divide
    * pre-rounded sums (a1's convention). */
  val c2AnalyticsEpoch = q("c2_analytics_epoch",
    s"""WITH win AS (
       |  SELECT user_id, event_id, CAST(ts AS DATE) AS day, event_type, value
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
       |    AND ts < TIMESTAMP '2024-01-22 00:00:00'),
       |daily AS (
       |  SELECT user_id, day,
       |         CAST(count(*) AS BIGINT) AS n_events,
       |         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       |         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
       |           AS n_purchases,
       |         ${rnd("sum(value)", 4)} AS total_value
       |  FROM win GROUP BY 1, 2),
       |latest AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |                               ORDER BY day DESC) AS rn
       |  FROM daily QUALIFY rn = 1),
       |derived AS (
       |  SELECT user_id, day, n_events, n_types, n_purchases, total_value,
       |         ${rnd("CASE WHEN n_events > 0 THEN total_value / n_events ELSE 0 END", 4)}
       |           AS value_per_event,
       |         ${rnd("100.0 * n_purchases / n_events", 2)} AS purchase_rate
       |  FROM latest)
       |SELECT CAST(user_id AS VARCHAR) AS user_id,
       |       strftime(day, '%Y-%m-%d') AS latest_day,
       |       CAST(n_events AS VARCHAR) AS n_events,
       |       CAST(n_types AS VARCHAR) AS n_types,
       |       CAST(n_purchases AS VARCHAR) AS n_purchases,
       |       CAST(total_value AS VARCHAR) AS total_value,
       |       CAST(value_per_event AS VARCHAR) AS value_per_event,
       |       CAST(purchase_rate AS VARCHAR) AS purchase_rate
       |FROM derived""".stripMargin) { (s, d) =>
    val win = Tables.events(s, d)
      .where(col("ts") >= lit("2024-01-08").cast("timestamp") &&
        col("ts") < lit("2024-01-22").cast("timestamp"))
      .select(col("user_id"), col("ts").cast("date").as("day"),
        col("event_type"), col("value"))
    val daily = win.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_types"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum("value"), 4).as("total_value"))
    val latest = graft.ops.Dedup.keepFirstBy(daily, Seq("user_id"),
      Seq(col("day").desc))
    val derived = latest
      .withColumn("value_per_event",
        round(when(col("n_events") > 0, col("total_value") / col("n_events"))
          .otherwise(0), 4))
      .withColumn("purchase_rate",
        round(lit(100.0) * col("n_purchases") / col("n_events"), 2))
    // warehouse edge: sanitize (already identifier-safe) + all-string
    // (F19/F20 — sinks.Warehouse.allString semantics), day formatted as
    // its ISO date string
    derived.select(
      col("user_id").cast("string").as("user_id"),
      date_format(col("day"), "yyyy-MM-dd").as("latest_day"),
      col("n_events").cast("string").as("n_events"),
      col("n_types").cast("string").as("n_types"),
      col("n_purchases").cast("string").as("n_purchases"),
      col("total_value").cast("string").as("total_value"),
      col("value_per_event").cast("string").as("value_per_event"),
      col("purchase_rate").cast("string").as("purchase_rate"))
  }

  /** U6 — INTERSECT ALL (bag semantics): order keys shared between the
    * 'F'-status and high-value order populations, preserving
    * multiplicity per (clerk-free) projection — completes the set-op
    * family next to u2's set-semantics intersect and u3's EXCEPT ALL.
    * Spark plans the same Expand+count-min trick as EXCEPT ALL — a
    * single shuffle, no join blowup. */
  val u6IntersectAll = q("u6_intersect_all",
    """SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT) AS price_band
      |FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT ALL
      |SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT) AS price_band
      |FROM orders WHERE o_totalprice > 100000""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.where(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), floor(col("o_totalprice")).cast("long").as("price_band"))
    val b = o.where(col("o_totalprice") > 100000)
      .select(col("o_orderpriority"), floor(col("o_totalprice")).cast("long").as("price_band"))
    a.intersectAll(b)
  }

  /** A20 — boolean aggregate family: bool_and / bool_or (ANSI EVERY/ANY)
    * + count_if per group — the guard-condition rollups (e.g. "did every
    * line of this order ship in-window?") warehouse QA queries lean on.
    * All partial-aggregable. */
  val a20BoolAggs = q("a20_bool_aggs",
    """SELECT l_returnflag,
      |       bool_and(l_quantity > 1) AS all_multi_qty,
      |       bool_or(l_discount > 0.09) AS any_deep_discount,
      |       CAST(count(CASE WHEN l_tax > 0.05 THEN 1 END) AS BIGINT) AS n_high_tax,
      |       bool_and(l_shipdate >= TIMESTAMP '1995-01-01 00:00:00') AS all_shipped_after_95
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(bool_and(col("l_quantity") > 1).as("all_multi_qty"),
        bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
        count_if(col("l_tax") > 0.05).as("n_high_tax"),
        bool_and(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
          .as("all_shipped_after_95"))
  }

  /** SQL surface — GROUPING SETS through `spark.sql`, the text form of
    * a9's API query: per-(status, priority), per-status, and grand-total
    * rollups in one pass with grouping() disambiguation markers. One
    * Expand + one shuffle — not three queries. */
  val sqlGroupingSets = q("sql_grouping_sets",
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |       coalesce(o_orderpriority, 'ALL') AS priority,
       |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       |       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("sum(o_totalprice)", 2)} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |                        (o_orderstatus), ())""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("gs_orders")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |       count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())""".stripMargin)
  }

  /** P10 — column-profiling operator (the warehouse ANALYZE/data-quality
    * report): per column of orders — null count, distinct count, min/max
    * rendered as strings — computed in ONE scan (all measures ride a
    * single aggregate row, then unpivot to the per-column report; the
    * profile never rescans per column).
    *
    * Numeric min/max renderings: DOUBLE columns are formatted via the
    * engines' shared shortest-round-trip float printing; date/int render
    * canonically. */
  val p10ColumnProfile = q("p10_column_profile",
    """WITH m AS (
      |  SELECT
      |    count(*) AS n_rows,
      |    count(o_orderkey) AS nn_orderkey,
      |    count(DISTINCT o_orderkey) AS nd_orderkey,
      |    CAST(min(o_orderkey) AS VARCHAR) AS mn_orderkey,
      |    CAST(max(o_orderkey) AS VARCHAR) AS mx_orderkey,
      |    count(o_orderstatus) AS nn_status,
      |    count(DISTINCT o_orderstatus) AS nd_status,
      |    CAST(min(o_orderstatus) AS VARCHAR) AS mn_status,
      |    CAST(max(o_orderstatus) AS VARCHAR) AS mx_status,
      |    count(o_totalprice) AS nn_price,
      |    count(DISTINCT o_totalprice) AS nd_price,
      |    CAST(min(o_totalprice) AS VARCHAR) AS mn_price,
      |    CAST(max(o_totalprice) AS VARCHAR) AS mx_price,
      |    count(o_orderdate) AS nn_date,
      |    count(DISTINCT o_orderdate) AS nd_date,
      |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn_date,
      |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx_date
      |  FROM orders)
      |SELECT u.col_name,
      |       CAST(m.n_rows AS BIGINT) AS n_rows,
      |       CAST(CASE u.col_name
      |         WHEN 'o_orderkey' THEN m.n_rows - m.nn_orderkey
      |         WHEN 'o_orderstatus' THEN m.n_rows - m.nn_status
      |         WHEN 'o_totalprice' THEN m.n_rows - m.nn_price
      |         ELSE m.n_rows - m.nn_date END AS BIGINT) AS n_nulls,
      |       CAST(CASE u.col_name
      |         WHEN 'o_orderkey' THEN m.nd_orderkey
      |         WHEN 'o_orderstatus' THEN m.nd_status
      |         WHEN 'o_totalprice' THEN m.nd_price
      |         ELSE m.nd_date END AS BIGINT) AS n_distinct,
      |       CASE u.col_name
      |         WHEN 'o_orderkey' THEN m.mn_orderkey
      |         WHEN 'o_orderstatus' THEN m.mn_status
      |         WHEN 'o_totalprice' THEN m.mn_price
      |         ELSE m.mn_date END AS min_value,
      |       CASE u.col_name
      |         WHEN 'o_orderkey' THEN m.mx_orderkey
      |         WHEN 'o_orderstatus' THEN m.mx_status
      |         WHEN 'o_totalprice' THEN m.mx_price
      |         ELSE m.mx_date END AS max_value
      |FROM m CROSS JOIN (
      |  SELECT unnest(['o_orderkey', 'o_orderstatus', 'o_totalprice',
      |                 'o_orderdate']) AS col_name) u""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val m = o.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_orderkey")).as("nn_orderkey"),
      countDistinct(col("o_orderkey")).as("nd_orderkey"),
      min(col("o_orderkey")).cast("string").as("mn_orderkey"),
      max(col("o_orderkey")).cast("string").as("mx_orderkey"),
      count(col("o_orderstatus")).as("nn_status"),
      countDistinct(col("o_orderstatus")).as("nd_status"),
      min(col("o_orderstatus")).cast("string").as("mn_status"),
      max(col("o_orderstatus")).cast("string").as("mx_status"),
      count(col("o_totalprice")).as("nn_price"),
      countDistinct(col("o_totalprice")).as("nd_price"),
      min(col("o_totalprice")).cast("string").as("mn_price"),
      max(col("o_totalprice")).cast("string").as("mx_price"),
      count(col("o_orderdate")).as("nn_date"),
      countDistinct(col("o_orderdate")).as("nd_date"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mn_date"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mx_date"))
    val cols = Seq(
      ("o_orderkey", "nn_orderkey", "nd_orderkey", "mn_orderkey", "mx_orderkey"),
      ("o_orderstatus", "nn_status", "nd_status", "mn_status", "mx_status"),
      ("o_totalprice", "nn_price", "nd_price", "mn_price", "mx_price"),
      ("o_orderdate", "nn_date", "nd_date", "mn_date", "mx_date"))
    val rows = cols.map { case (name, nn, nd, mn, mx) =>
      struct(lit(name).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(nn)).as("n_nulls"),
        col(nd).as("n_distinct"),
        col(mn).as("min_value"),
        col(mx).as("max_value"))
    }
    m.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  val all: Seq[Q] = Seq(c2AnalyticsEpoch, u6IntersectAll, a20BoolAggs,
    sqlGroupingSets, p10ColumnProfile)
}
