package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 4: null-safe equality join, multi-DISTINCT
  * aggregation, the string-function family, null-preserving outer
  * explode, and the value-window (first/last/nth/lag-default) family.
  */
object Extended4 {

  /** J10 — null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    * keys MATCH each other, unlike plain equi-join where they silently
    * drop — the semantics MERGE statements and dedup-by-nullable-column
    * need. Still hash-joinable (null is one more key value), so the plan
    * stays a shuffle/broadcast hash join, never a nested loop. */
  val j10NullSafeJoin = q("j10_null_safe_join",
    """WITH a AS (
      |  SELECT c_custkey AS ak,
      |         CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS k
      |  FROM customer WHERE c_custkey <= 300),
      |b AS (
      |  SELECT c_custkey AS bk,
      |         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS k
      |  FROM customer WHERE c_custkey <= 300)
      |SELECT a.ak, b.bk
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |WHERE a.ak < b.bk""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).where(col("c_custkey") <= 300)
    val a = c.select(col("c_custkey").as("ak"),
      when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_nationkey")).as("ka"))
    val b = c.select(col("c_custkey").as("bk"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_nationkey")).as("kb"))
    a.join(b, col("ka") <=> col("kb"))
      .where(col("ak") < col("bk"))
      .select("ak", "bk")
  }

  /** A14 — multiple DISTINCT aggregates in one pass: Catalyst plans the
    * N-distinct mix with a single Expand (one row per distinct clause)
    * instead of N self-joined subqueries — the shape to know before
    * writing "count distinct users, sessions, and SKUs" over 100 TB. */
  val a14MultiDistinct = q("a14_multi_distinct",
    s"""SELECT l_returnflag,
       |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
       |       ${rnd("sum(DISTINCT l_quantity)", 2)} AS sum_dq,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct("l_partkey").as("n_part"),
        round(sum_distinct(col("l_quantity")), 2).as("sum_dq"),
        count(lit(1)).as("n"))
  }

  /** F24 — string-function family over part names: case mapping, reverse,
    * pad-with-truncate, literal replace, position, prefix, repeat,
    * split_part — all codegen'd scan-side built-ins (semantics verified
    * identical across engines, e.g. both lpad and left truncate). */
  val f24StringKitchen = q("f24_string_kitchen",
    """SELECT p_partkey,
      |       upper(p_name) AS uname,
      |       reverse(p_brand) AS rbrand,
      |       lpad(p_type, 20, '.') AS padded,
      |       replace(p_name, 'a', '@') AS repl,
      |       CAST(strpos(p_name, 'e') AS INT) AS pos_e,
      |       left(p_type, 5) AS l5,
      |       repeat(p_brand, 2) AS b2,
      |       split_part(p_type, ' ', 1) AS first_word
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      upper(col("p_name")).as("uname"),
      reverse(col("p_brand")).as("rbrand"),
      lpad(col("p_type"), 20, ".").as("padded"),
      expr("replace(p_name, 'a', '@')").as("repl"),
      instr(col("p_name"), "e").cast("int").as("pos_e"),
      substring(col("p_type"), 1, 5).as("l5"),
      repeat(col("p_brand"), 2).as("b2"),
      split_part(col("p_type"), lit(" "), lit(1)).as("first_word"))
  }

  /** E13 — null-preserving outer explode (posexplode_outer): rows whose
    * array is empty survive with NULL position/value instead of
    * vanishing — the difference between "docs with no long tokens are
    * gone" and "…are reported empty" in a corpus report. */
  val e13OuterExplode = q("e13_outer_explode",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'),
      |                     x -> x <> '' AND len(x) >= 8) AS a
      |  FROM documents)
      |SELECT doc_id, CAST(NULL AS INT) AS pos, CAST(NULL AS VARCHAR) AS tok
      |FROM tok WHERE len(a) = 0
      |UNION ALL
      |SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, a[u.i] AS tok
      |FROM tok CROSS JOIN LATERAL unnest(generate_series(1, len(a))) u(i)
      |WHERE len(a) > 0""".stripMargin) { (s, d) =>
    val longToks = filter(split(trim(col("text")), "\\s+"),
      x => x =!= "" && length(x) >= 8)
    Tables.documents(s, d)
      .select(col("doc_id"), longToks.as("a"))
      .select(col("doc_id"), posexplode_outer(col("a")))
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("tok"))
  }

  /** A15 — value-window family: first/last/nth value with explicit full
    * frames (the default RANGE … CURRENT ROW frame makes last_value a
    * running self — the classic footgun, avoided here on both engines),
    * plus lag with a default. Deterministic total order via the unique
    * o_orderkey tiebreak. */
  val a15ValueWindows = q("a15_value_windows",
    s"""SELECT o_orderkey,
       |       ${rnd("first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)", 2)} AS first_price,
       |       ${rnd("last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", 2)} AS last_price,
       |       ${rnd("nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", 2)} AS second_price,
       |       ${rnd("lag(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)", 2)} AS prev_price
       |FROM orders""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(col("o_orderkey"),
      round(first("o_totalprice").over(w), 2).as("first_price"),
      round(last("o_totalprice").over(wFull), 2).as("last_price"),
      round(nth_value(col("o_totalprice"), 2).over(wFull), 2).as("second_price"),
      round(lag(col("o_totalprice"), 1, -1.0).over(w), 2).as("prev_price"))
  }

  /** E14 — typed collect denormalization: per-user event profile as a
    * deterministically ordered "type:count" list — the collect_list +
    * array_sort reshape that turns a fact table into a per-entity feature
    * string. Bounded output per key (distinct event types), so safe at
    * any scale — unlike collecting raw events. */
  val e14TypedCollect = q("e14_typed_collect",
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
      |SELECT user_id,
      |       array_to_string(list_sort(list(event_type || ':' || CAST(n AS VARCHAR))), ',')
      |         AS profile
      |FROM c GROUP BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_list(
        concat(col("event_type"), lit(":"), col("n").cast("string")))), ",")
        .as("profile"))
  }

  /** F25 — regex group extraction: split "<adjective> <noun>" part names
    * into typed columns via capture groups, with the no-match → empty
    * convention both engines share when the group list is explicit. */
  val f25RegexExtract = q("f25_regex_extract",
    """SELECT p_partkey,
      |       regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1) AS adjective,
      |       regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2) AS noun,
      |       CAST(regexp_matches(p_name, '^(red|blue|green) ') AS BOOLEAN) AS is_color
      |FROM part""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 1).as("adjective"),
      regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 2).as("noun"),
      col("p_name").rlike("^(red|blue|green) ").as("is_color"))
  }

  /** E15 — time-series gap fill + forward fill: densify each user's
    * hourly activity onto a complete hour grid (first→last active hour),
    * then carry the last observed value across the gaps
    * (last_value IGNORE NULLS — Spark last(_, ignoreNulls=true)). The
    * grid generates scan-side (sequence + explode, no shuffle); the fill
    * is one window shuffle on the entity key. The densify-then-fill
    * shape every downstream charting/feature layer needs. */
  val e15GapFill = q("e15_gap_fill_ffill",
    s"""WITH hourly AS (
       |  SELECT user_id, date_trunc('hour', ts::TIMESTAMP) AS h,
       |         sum(value) AS v
       |  FROM events GROUP BY 1, 2),
       |bounds AS (
       |  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
       |grid AS (
       |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
       |  FROM bounds)
       |SELECT g.user_id,
       |       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       |       ${rnd("hourly.v", 2)} AS v_raw,
       |       ${rnd("last_value(hourly.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h ASC)", 2)} AS v_filled,
       |       CAST(hourly.v IS NULL AS BOOLEAN) AS was_gap
       |FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h""".stripMargin) { (s, d) =>
    val hourly = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum("value").as("v"))
    val grid = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy(col("h").asc)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        round(col("v"), 2).as("v_raw"),
        round(last("v", ignoreNulls = true).over(w), 2).as("v_filled"),
        col("v").isNull.as("was_gap"))
  }

  /** W9 — distribution ranks (percent_rank, cume_dist): the normalized
    * complements of w6's ordinal ranking family — within-segment balance
    * percentile per customer. Deterministic via the custkey tiebreak;
    * one window shuffle. */
  val w9DistRanks = q("w9_dist_ranks",
    s"""SELECT c_custkey, c_mktsegment,
       |       ${rnd("percent_rank() OVER w", 6)} AS pct_rank,
       |       ${rnd("cume_dist() OVER w", 6)} AS cume
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment
       |             ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** P7 — fixed-size uniform sample per group via the typed BottomK
    * Aggregator (ops/Sampling): priority = md5(id), keep the k smallest —
    * mergeable, order-independent, deterministic (unlike reservoir
    * sampling), so it runs as a partial-aggregable hash aggregate with
    * map-side combine and reproduces identically on any engine. The
    * oracle recomputes it with a rank window — custom Aggregator vs SQL
    * semantics, hash-compared. */
  val p7BottomkSample = q("p7_bottomk_sample",
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
      |                                     doc_id ASC) AS rn
      |  FROM documents)
      |SELECT source, doc_id FROM ranked WHERE rn <= 5""".stripMargin) { (s, d) =>
    import s.implicits._
    val ds = Tables.documents(s, d)
      .select(md5(col("doc_id").cast("string")), col("doc_id"), col("source"))
      .as[(String, Long, String)]
    ds.groupByKey(_._3)
      .mapValues(r => (r._1, r._2))
      .agg(graft.ops.Sampling.BottomK(5).toColumn.name("sample"))
      .toDF("source", "sample")
      .select(col("source"), explode(col("sample")).as("doc_id"))
  }

  val all: Seq[Q] = Seq(j10NullSafeJoin, a14MultiDistinct, f24StringKitchen,
    e13OuterExplode, a15ValueWindows, e14TypedCollect, f25RegexExtract,
    e15GapFill, w9DistRanks, p7BottomkSample)
}
