package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 coverage widening: grouping sets, exact percentiles,
  * correlation/covariance, full-outer reconciliation, skew-salted
  * aggregation (proved against the plain-agg oracle), unpivot/melt,
  * native session windows, fuzzy edit-distance matching, and int8
  * embedding quantization.
  */
object Extended {

  /** A9 — explicit GROUPING SETS ((status), (priority), ()) with
    * grouping() markers: the general form behind rollup/cube. One
    * shuffle; Spark expands sets via Expand, partial-aggregates each. */
  val a9GroupingSets = q("a9_grouping_sets",
    s"""SELECT o_orderstatus, o_orderpriority,
       |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("sum(o_totalprice)", 2)} AS sum_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority",
        "n", "sum_price")
  }

  /** A10 — exact interpolated percentiles (R-7 / quantile_cont): sort-based
    * aggregate per group. At scale, prefer the approx sketch (a8) unless
    * exactness is contractually required. */
  val a10Percentiles = q("a10_exact_percentiles",
    s"""SELECT l_returnflag,
       |       ${rnd("quantile_cont(l_extendedprice, 0.25)", 4)} AS p25,
       |       ${rnd("quantile_cont(l_extendedprice, 0.50)", 4)} AS p50,
       |       ${rnd("quantile_cont(l_extendedprice, 0.75)", 4)} AS p75
       |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.25D)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.50D)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75D)"), 4).as("p75"))
  }

  /** A11 — correlation / covariance per group (the profiling stats a
    * curation report needs beyond a5's mean/stddev). */
  val a11CorrCovar = q("a11_corr_covar",
    s"""SELECT l_returnflag,
       |       ${rnd("corr(l_quantity, l_extendedprice)", 4)} AS corr_qp,
       |       ${rnd("covar_samp(l_quantity, l_extendedprice)", 2)} AS covs_qp,
       |       ${rnd("covar_pop(l_quantity, l_extendedprice)", 2)} AS covp_qp
       |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covs_qp"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covp_qp"))
  }

  /** J7 — full-outer snapshot reconciliation: two overlapping extracts of
    * the same keyspace, matched by key, with presence classification and
    * newest-wins field merge — the symmetric completion of the j5 upsert. */
  val j7FullOuterMerge = q("j7_full_outer_merge",
    s"""WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
       |b AS (SELECT o_orderkey, ${rnd("o_totalprice * 1.05", 2)} AS o_totalprice
       |      FROM orders WHERE o_orderkey % 2 = 0)
       |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       |       CASE WHEN a.o_orderkey IS NULL THEN 'right_only'
       |            WHEN b.o_orderkey IS NULL THEN 'left_only'
       |            ELSE 'both' END AS presence,
       |       ${rnd("coalesce(b.o_totalprice, a.o_totalprice)", 2)} AS merged_price
       |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("ak"), col("o_totalprice").as("ap"))
    val b = o.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("bk"),
        round(col("o_totalprice") * 1.05, 2).as("bp"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(coalesce(col("ak"), col("bk")).as("o_orderkey"),
        when(col("ak").isNull, "right_only")
          .when(col("bk").isNull, "left_only")
          .otherwise("both").as("presence"),
        round(coalesce(col("bp"), col("ap")), 2).as("merged_price"))
  }

  /** J8 — skew-salted two-phase aggregation, proved equal to the plain
    * single-shuffle oracle. The salt splits any hot key across `buckets`
    * partial tasks; the combine phase re-aggregates per key. Exact
    * because l_quantity is whole-number-valued (integer-exact double
    * sums are associative). */
  val j8SaltedAgg = q("j8_salted_agg",
    """SELECT l_suppkey, sum(l_quantity) AS sum_qty,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_quantity"))
      .withColumn("n_rows", lit(1L))
    graft.ops.Salt.saltedAgg(li, "l_suppkey", buckets = 8,
      partials = Seq(("l_quantity", sum), ("n_rows", sum)),
      combine = c => sum(col(c)))
      .select(col("l_suppkey"), col("l_quantity").as("sum_qty"), col("n_rows"))
  }

  /** E8 — unpivot/melt: wide measures → (key, measure, val) long form,
    * the inverse of e6's pivot. Spark plans Expand — no shuffle at all. */
  val e8Unpivot = q("e8_unpivot",
    """SELECT l_orderkey, l_linenumber, m.measure, m.val
      |FROM lineitem,
      |     LATERAL (VALUES ('l_quantity', l_quantity),
      |                     ('l_discount', l_discount),
      |                     ('l_tax', l_tax)) m(measure, val)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "val")
  }

  /** E9 — NATIVE session windows (session_window function): merge-on-gap
    * semantics with window end = last event + gap. Oracle reconstructs
    * the same sessions independently via lag/cumsum — also the proof that
    * Spark's built-in operator equals e2's composed form. */
  val e9SessionWindow = q("e9_session_window",
    """WITH seq AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, epoch_us(ts::TIMESTAMP) AS tus,
      |         lag(epoch_us(ts::TIMESTAMP)) OVER (
      |           PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC) AS prev
      |  FROM events),
      |marked AS (
      |  SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_start
      |  FROM seq),
      |sess AS (
      |  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
  }

  /** T6 — fuzzy near-match by edit distance: each document vs its
    * predecessor (same source, doc_id order) on a 32-char prefix — the
    * pairwise-verify primitive of fuzzy dedup (bounded inputs keep the
    * O(len²) DP cheap; pair generation stays windowed, never quadratic). */
  val t6EditDistance = q("t6_edit_distance",
    """WITH seq AS (
      |  SELECT doc_id, source, substr(text, 1, 32) AS head,
      |         lag(substr(text, 1, 32)) OVER (
      |           PARTITION BY source ORDER BY doc_id ASC) AS prev_head
      |  FROM documents)
      |SELECT doc_id, CAST(levenshtein(head, prev_head) AS INT) AS edit_dist,
      |       CAST(levenshtein(head, prev_head) <= 12 AS BOOLEAN) AS near_match
      |FROM seq WHERE prev_head IS NOT NULL""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("source").orderBy(col("doc_id").asc)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), substring(col("text"), 1, 32).as("head"))
      .withColumn("prev_head", lag("head", 1).over(w))
      .where(col("prev_head").isNotNull)
      .select(col("doc_id"),
        levenshtein(col("head"), col("prev_head")).cast("int").as("edit_dist"),
        (levenshtein(col("head"), col("prev_head")) <= 12).as("near_match"))
  }

  /** V5 — symmetric int8 quantization of embeddings: per-vector scale =
    * max|x|/127, q = floor(x/scale + 0.5) (floor form — identical FP ops
    * in every engine, no round-half ambiguity), plus exact integer L1 of
    * the quantized vector and max reconstruction error. The compression
    * step before shipping 100 TB of embeddings anywhere. */
  val v5Quantize = q("v5_int8_quantize",
    s"""WITH v AS (
       |  SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |sc AS (
       |  SELECT vec_id,
       |         CASE WHEN max(abs(x)) = 0 THEN 1.0 ELSE max(abs(x)) / 127.0 END AS scale
       |  FROM v GROUP BY 1),
       |qv AS (
       |  SELECT v.vec_id, floor(x / scale + 0.5) AS qx, x, scale
       |  FROM v JOIN sc USING (vec_id))
       |SELECT vec_id, ${rnd("any_value(scale)", 6)} AS scale,
       |       CAST(sum(abs(qx)) AS BIGINT) AS q_l1,
       |       ${rnd("max(abs(x - qx * scale))", 6)} AS max_abs_err
       |FROM qv GROUP BY vec_id""".stripMargin) { (s, d) =>
    val arr = graft.vec.Similarity.asDouble(col("embedding"))
    val absMax = array_max(transform(arr, x => abs(x)))
    val scale = when(absMax === 0.0, 1.0).otherwise(absMax / 127.0)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), arr.as("v"), scale.as("scale"))
    val qx = transform(col("v"), x => floor(x / col("scale") + 0.5))
    // NB: round(scale) must live in its own projection — aliasing a
    // rounded "scale" in the same SELECT makes Spark's lateral-column-
    // alias resolution bind the col("scale") inside the zip_with lambda
    // to the ROUNDED alias, silently corrupting the error term
    emb.select(col("vec_id"), col("scale"), qx.as("q"), col("v"))
      .select(col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0.0), (acc, x) => acc + abs(x))
          .cast("bigint").as("q_l1"),
        array_max(zip_with(col("v"), col("q"),
          (x, q) => abs(x - q * col("scale")))).as("err_raw"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        col("q_l1"), round(col("err_raw"), 6).as("max_abs_err"))
  }

  /** T7 — winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every 3-token shingle, slide a window of 4 hashes, keep each
    * window's minimum — guarantees any shared run ≥ w+k-1 tokens shares
    * a fingerprint, at ~2/(w+1) the storage of full shingling. All
    * scan-side (zero shuffle); md5-based so any engine reproduces it. */
  val t7Winnow = q("t7_winnow_fingerprint",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |              ELSE list_transform(generate_series(1, len(t) - 2),
      |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM tok),
      |h AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM sh),
      |wins AS (
      |  SELECT doc_id,
      |         CASE WHEN len(hs) < 4 THEN [list_min(hs)]
      |              ELSE list_transform(generate_series(1, len(hs) - 3),
      |                                  i -> list_min(hs[i:i+3])) END AS mins
      |  FROM h)
      |SELECT doc_id,
      |       md5(array_to_string(list_sort(list_distinct(mins)), ' ')) AS winnow_fp,
      |       CAST(len(list_distinct(mins)) AS INT) AS n_fp
      |FROM wins""".stripMargin) { (s, d) =>
    val hs = transform(graft.text.NearDup.shingles(col("text"), 3), x => md5(x))
    val mins = when(size(hs) < 4, array(array_min(hs)))
      .otherwise(transform(sequence(lit(1), size(hs) - 3),
        i => array_min(slice(hs, i, lit(4)))))
    Tables.documents(s, d)
      .select(col("doc_id"), array_sort(array_distinct(mins)).as("fps"))
      .select(col("doc_id"),
        md5(array_join(col("fps"), " ")).as("winnow_fp"),
        size(col("fps")).as("n_fp"))
  }

  /** T8 — pattern redaction (the PII-scrub pass every training corpus
    * needs): mask digit runs and quoted tokens, count replacements.
    * Scan-side regexp, zero shuffle; patterns kept in the common subset
    * of Java/RE2 regex dialects so every engine executes them alike. */
  val t8Redact = q("t8_redact",
    """SELECT doc_id,
      |       regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
      |                      'x[a-z0-9]{4,}', '<ID>', 'g') AS redacted,
      |       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
      |            AS INT) AS n_digits_masked
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), "[0-9]+", "<NUM>"),
        "x[a-z0-9]{4,}", "<ID>").as("redacted"),
      (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
        .cast("int").as("n_digits_masked"))
  }

  /** SQL2 — the flagship star join through the spark.sql SURFACE (temp
    * views + SQL text + BROADCAST hints): proves the SQL entry point
    * plans identically to the DataFrame API — same broadcast star shape,
    * one shuffle for the final aggregate. */
  val sqlStarJoin = q("sql_star_join",
    s"""SELECT n.n_name AS nation,
       |       CAST(count(*) AS BIGINT) AS n_lines,
       |       ${rnd("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE o.o_orderstatus = 'F'
       |GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("sql_li")
    Tables.orders(s, d).createOrReplaceTempView("sql_o")
    Tables.customer(s, d).createOrReplaceTempView("sql_c")
    Tables.nation(s, d).createOrReplaceTempView("sql_n")
    s.sql(
      """SELECT /*+ BROADCAST(c), BROADCAST(n) */ n.n_name AS nation,
        |       count(*) AS n_lines,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM sql_li l
        |JOIN sql_o o ON l.l_orderkey = o.o_orderkey
        |JOIN sql_c c ON o.o_custkey = c.c_custkey
        |JOIN sql_n n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY n.n_name""".stripMargin)
  }

  /** E10 — schema-typed JSON parse with corrupt-record tolerance:
    * from_json against a declared StructType (vs e3's untyped path
    * extraction); malformed payloads (planted on every 7th row) parse to
    * null instead of failing the job — the permissive-ingest behavior a
    * pipeline needs when 100 TB of scraped JSON is never all clean. */
  val e10FromJson = q("e10_from_json_typed",
    """WITH m AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, length(props) - 2)
      |              ELSE props END AS s
      |  FROM events)
      |SELECT event_id,
      |       CASE WHEN json_valid(s)
      |            THEN CAST(json_extract_string(s, '$.k') AS BIGINT) END AS k,
      |       CAST(CASE WHEN json_valid(s)
      |                 THEN json_extract_string(s, '$.k') IS NOT NULL
      |                 ELSE FALSE END AS BOOLEAN) AS is_valid
      |FROM m""".stripMargin) { (s, d) =>
    // truncation (not suffix garbage): Spark's Jackson parse tolerates
    // trailing characters after a complete document, DuckDB's doesn't —
    // a truncated document is malformed to every parser
    val mutated = when(col("event_id") % 7 === 0,
      expr("substring(props, 1, length(props) - 2)")).otherwise(col("props"))
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(mutated, org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("j"))
      .select(col("event_id"), col("j.k").as("k"),
        col("j.k").isNotNull.as("is_valid"))
  }

  val all: Seq[Q] = Seq(a9GroupingSets, a10Percentiles, a11CorrCovar,
    j7FullOuterMerge, j8SaltedAgg, e8Unpivot, e9SessionWindow,
    t6EditDistance, v5Quantize, t7Winnow, t8Redact, sqlStarJoin, e10FromJson)
}
