package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 1 — the product-analytics operator family a
  * YouTube-metrics warehouse (the reference's domain,
  * `/root/reference/Python-pipeline/dataprocessing3.py`) grows into once
  * the data is in a real engine: funnels, cohort retention, path mining,
  * SCD-2 dimension history, CDC apply, decile bucketing, histograms,
  * conditional aggregation, calendar math, and bag-semantics difference.
  *
  * Scale notes are per-query; the shared principles: every aggregation is
  * partial-aggregable (map-side combine), every join on the fact side is
  * an equi-join shuffle on the entity key that AQE can re-balance, and
  * window functions always carry a deterministic (ts, id) sort key so
  * results are reproducible under any partitioning.
  */
object Analytics2 {

  /** G1 — staged conversion funnel view→click→purchase: stage n must
    * happen at-or-after the user's first stage n-1 event. Three
    * aggregations on the same user_id key — one logical regroup, and the
    * stage-k frontier (one row per user) broadcasts to stage k+1 at any
    * scale because it only shrinks. */
  val g1Funnel = q("g1_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts::TIMESTAMP >= v.t1
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts::TIMESTAMP >= c.t2
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      |UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id")).where(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id")).where(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def cnt(df: org.apache.spark.sql.DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
    cnt(v, "1_view").unionAll(cnt(c, "2_click")).unionAll(cnt(p, "3_purchase"))
  }

  /** G2 — weekly cohort retention: users bucketed by the ISO week of
    * their first event; one output cell per (cohort week, week offset)
    * counting distinct active users. Two shuffles (first-seen per user,
    * then the cell aggregate) — both keyed small relative to raw events,
    * so the plan is scan-bound at 100 TB. */
  val g2CohortRetention = q("g2_cohort_retention",
    """WITH first AS (
      |  SELECT user_id, date_trunc('week', min(ts::TIMESTAMP)) AS cohort
      |  FROM events GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP) AS wk FROM events)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      |       CAST(datediff('day', cohort, wk) // 7 AS INT) AS week_offset,
      |       CAST(count(*) AS BIGINT) AS n_active
      |FROM act JOIN first USING (user_id)
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort"))
    val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
    act.join(first, Seq("user_id"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(wk, cohort) div 7").cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** G3 — behavioral path mining: event-type bigram transition counts per
    * user timeline (deterministic (ts, event_id) ordering). The lag
    * window shuffles once on user_id; the bigram count is a tiny
    * follow-up aggregate. The n-gram generalization is a longer lag
    * chain, same single shuffle. */
  val g3PathBigrams = q("g3_path_bigrams",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (
      |           PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC) AS prev
      |  FROM events)
      |SELECT prev AS prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), lag("event_type", 1).over(w).as("prev"))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** J9 — SCD Type-2 dimension build: each customer's order-status
    * history as effective-dated rows (eff_from = change ts, eff_to =
    * next change, open interval = 9999-12-31 + is_current). One window
    * shuffle on the entity key; at 100 TB this is the standard
    * lead()-over-entity history reconstruction, linear in input. */
  val j9Scd2 = q("j9_scd2_history",
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate::TIMESTAMP AS ts,
      |         lead(o_orderdate::TIMESTAMP) OVER (
      |           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS nxt
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_orderstatus,
      |       strftime(ts, '%Y-%m-%d') AS eff_from,
      |       coalesce(strftime(nxt, '%Y-%m-%d'), '9999-12-31') AS eff_to,
      |       CAST(nxt IS NULL AS BOOLEAN) AS is_current
      |FROM ranked""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate"), lead("o_orderdate", 1).over(w).as("nxt"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("eff_from"),
        coalesce(date_format(col("nxt"), "yyyy-MM-dd"), lit("9999-12-31")).as("eff_to"),
        col("nxt").isNull.as("is_current"))
  }

  /** E11 — CDC apply: a change stream (key = user_id, seq = event_id,
    * op = delete when event_type='error' else upsert) collapsed to final
    * table state — keep-last per key, then drop keys whose last op is a
    * delete. Same shape as the reference's warehouse dedup
    * (ingestdatainbigquery.py:84-96) with tombstone semantics added; one
    * window shuffle, or dropDuplicatesWithinWatermark under streaming. */
  val e11CdcApply = q("e11_cdc_apply",
    s"""WITH c AS (
       |  SELECT user_id, event_id,
       |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
       |  FROM events)
       |SELECT user_id, event_id AS last_seq, ${rnd("value", 4)} AS value
       |FROM c WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("event_id").as("last_seq"),
        round(col("value"), 4).as("value"))
  }

  /** W7 — ntile decile bucketing within group (per-segment account-balance
    * deciles with a deterministic custkey tiebreak). ntile needs each
    * partition's total count, so it shuffles on the partition key —
    * bounded by the largest group, not the table; for global ntile at
    * scale, switch to approx-quantile cutpoints (a8) + width_bucket. */
  val w7Ntile = q("w7_ntile_deciles",
    """SELECT c_custkey, c_mktsegment,
      |       CAST(ntile(10) OVER (
      |         PARTITION BY c_mktsegment
      |         ORDER BY c_acctbal ASC, c_custkey ASC) AS INT) AS decile
      |FROM customer""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), ntile(10).over(w).as("decile"))
  }

  /** A12 — fixed-width histogram (50k-wide price buckets) via explicit
    * floor arithmetic (portable across engines, unlike width_bucket
    * dialects). Pure map-side bucketing + tiny aggregate: the 100 TB
    * profile pass. */
  val a12Histogram = q("a12_histogram",
    s"""SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("min(o_totalprice)", 2)} AS lo,
       |       ${rnd("max(o_totalprice)", 2)} AS hi
       |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
  }

  /** A13 — conditional aggregation (FILTER clause family): multiple
    * differently-predicated aggregates in ONE pass over the fact table —
    * the idiom that replaces N separate filtered scans with one. */
  val a13ConditionalAgg = q("a13_conditional_agg",
    s"""SELECT c_nationkey,
       |       CAST(count(*) FILTER (c_acctbal < 0) AS BIGINT) AS n_neg,
       |       ${rnd("avg(c_acctbal) FILTER (c_acctbal > 0)", 2)} AS avg_pos,
       |       ${rnd("sum(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END)", 2)} AS building_bal
       |FROM customer GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d).groupBy("c_nationkey")
      .agg(count(when(col("c_acctbal") < 0, 1)).as("n_neg"),
        round(avg(when(col("c_acctbal") > 0, col("c_acctbal"))), 2).as("avg_pos"),
        round(sum(when(col("c_mktsegment") === "BUILDING", col("c_acctbal"))), 2)
          .as("building_bal"))
  }

  /** F23 — calendar/date-math kitchen: year/quarter/month extraction,
    * month-end, day arithmetic, ISO day-of-week (Spark weekday()+1 ≡
    * DuckDB isodow — both avoid the Sunday-first ambiguity). All
    * scan-side codegen, zero shuffle. */
  val f23DateKitchen = q("f23_date_kitchen",
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS INT) AS y,
      |       CAST(quarter(o_orderdate) AS INT) AS qtr,
      |       CAST(month(o_orderdate) AS INT) AS m,
      |       strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
      |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |       CAST(isodow(o_orderdate) AS INT) AS iso_dow
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      quarter(col("o_orderdate")).as("qtr"),
      month(col("o_orderdate")).as("m"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
      (weekday(col("o_orderdate")) + 1).cast("int").as("iso_dow"))
  }

  /** U3 — EXCEPT ALL (bag-semantics difference, preserves multiplicity):
    * the multiset complement of u2's INTERSECT. Spark plans a single
    * count-balancing aggregate (no join explosion). */
  val u3ExceptAll = q("u3_except_all",
    """SELECT l_orderkey, l_partkey FROM lineitem WHERE l_linenumber <= 3
      |EXCEPT ALL
      |SELECT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    li.where(col("l_linenumber") <= 3).select("l_orderkey", "l_partkey")
      .exceptAll(li.where(col("l_returnflag") === "R").select("l_orderkey", "l_partkey"))
  }

  val all: Seq[Q] = Seq(g1Funnel, g2CohortRetention, g3PathBigrams, j9Scd2,
    e11CdcApply, w7Ntile, a12Histogram, a13ConditionalAgg, f23DateKitchen,
    u3ExceptAll)
}
