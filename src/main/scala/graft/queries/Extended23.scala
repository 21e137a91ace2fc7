package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 23: engine-surface gaps — recursive SQL,
  * URL handling, exact-decimal money, plus two curation screens.
  *
  *  - sql_recursive_cte: Spark 4's WITH RECURSIVE (frontier join per
  *    level) — the hierarchy-walk class (org charts, BOM explosion,
  *    category trees) the engine previously covered only via the RDD
  *    connected-components loop.
  *  - f34_url_parse: native parse_url over a derived URL column — the
  *    CommonCrawl-style curation step every web corpus starts with.
  *  - d18_url_dedup: URL-canonicalization dedup (lowercase scheme/host,
  *    strip tracking query, trailing-slash normalize, keep min id) — C4
  *    deduped by URL before any content pass.
  *  - a22_decimal_exact: DECIMAL(12,2) money aggregation — bit-exact
  *    sums with NO rounding scaffold (the rnd() helper exists because
  *    doubles round differently across engines; decimals simply don't).
  *  - t26_readability: syllable-proxy readability grade (regexp_count,
  *    array-local, zero shuffle before the rollup).
  *  - g12_conversion_window: signup→purchase conversion within 1 h — the
  *    time-bounded funnel (e5/g1 have order, this has order + deadline).
  */
object Extended23 {

  /** SQL-surface recursive CTE: depth of every supplier in the implicit
    * binary-heap org chart (parent(k) = floor((k−1)/2)), rolled up per
    * level. Each recursion step is one frontier ⋈ supplier join — Spark
    * executes it as iterative UnionLoop with the frontier as a
    * broadcast-sized working set; depth is O(log n) levels. */
  val sqlRecursiveCte = q("sql_recursive_cte",
    """WITH RECURSIVE org(id, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
      |  UNION ALL
      |  SELECT s.s_suppkey, o.depth + 1
      |  FROM supplier s JOIN org o
      |    ON CAST(floor((s.s_suppkey - 1) / 2) AS BIGINT) = o.id
      |  WHERE s.s_suppkey > 0)
      |SELECT depth, count(*) AS n, min(id) AS min_id, max(id) AS max_id
      |FROM org GROUP BY 1""".stripMargin) { (s, d) =>
    // the recursive CTE's static side is re-executed EVERY iteration
    // (UnionLoop re-runs the join per step); materialize the tiny dim once
    // so ~10 iterations scan memory instead of re-opening the parquet
    Tables.supplier(s, d).localCheckpoint(true)
      .createOrReplaceTempView("sql_rec_sup")
    s.sql(
      """WITH RECURSIVE org(id, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
        |  UNION ALL
        |  SELECT s.s_suppkey, o.depth + 1
        |  FROM sql_rec_sup s JOIN org o
        |    ON CAST(floor((s.s_suppkey - 1) / 2) AS BIGINT) = o.id
        |  WHERE s.s_suppkey > 0)
        |SELECT depth, count(*) AS n, min(id) AS min_id, max(id) AS max_id
        |FROM org GROUP BY depth""".stripMargin)
  }

  /** Derived URL column shared by f34/d18: deterministic per-doc URL with
    * realistic noise — upper/lower scheme+host variants, optional
    * trailing slash, a tracking query param. */
  private val urlSqlExpr =
    """concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
      |       CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END,
      |       '.example.com/', lang,
      |       CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
      |       '?utm=', CAST(doc_id % 5 AS VARCHAR))""".stripMargin.replace("\n", " ")

  private val urlCol = {
    expr(
      """concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
        |       CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END,
        |       '.example.com/', lang,
        |       CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
        |       '?utm=', CAST(doc_id % 5 AS STRING))""".stripMargin)
  }

  /** F34 — URL parsing family: scheme-insensitive host, path, full query
    * string, and one named query parameter via Spark's native parse_url
    * (codegen'd; the oracle uses equivalent anchored regexes). Feeding a
    * crawl corpus, this is the first projection after the WARC scan. */
  val f34UrlParse = q("f34_url_parse",
    s"""WITH u AS (SELECT doc_id, $urlSqlExpr AS url FROM documents)
       |SELECT doc_id, url,
       |       lower(regexp_extract(url, '^[hH][tT][tT][pP][sS]?://([^/?]+)', 1)) AS host,
       |       regexp_extract(url, '^[a-zA-Z]+://[^/?]+([^?]*)', 1) AS path,
       |       regexp_extract(url, '\\?(.*)$$', 1) AS query,
       |       regexp_extract(url, '[?&]utm=([^&]*)', 1) AS utm
       |FROM u""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), urlCol.as("url"))
      .select(col("doc_id"), col("url"),
        lower(parse_url(col("url"), lit("HOST"))).as("host"),
        coalesce(parse_url(col("url"), lit("PATH")), lit("")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("utm")).as("utm"))
  }

  /** D18 — URL-canonicalization dedup: lowercase scheme+host, strip the
    * query, drop the trailing slash, then keep the smallest doc_id per
    * canonical URL. One derived-key groupBy — the cheapest dedup a web
    * corpus gets (C4 ran exactly this before any content hashing), and
    * the key is tiny next to the payload so the shuffle moves ids, not
    * documents. */
  val d18UrlDedup = q("d18_url_dedup",
    s"""WITH u AS (SELECT doc_id, $urlSqlExpr AS url FROM documents),
       |canon AS (
       |  SELECT doc_id,
       |         regexp_replace(lower(regexp_replace(url, '\\?.*$$', '')),
       |                        '/$$', '') AS curl
       |  FROM u)
       |SELECT curl, min(doc_id) AS keeper, count(*) AS n_dups
       |FROM canon GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), urlCol.as("url"))
      .select(col("doc_id"),
        regexp_replace(lower(regexp_replace(col("url"), lit("\\?.*$"), lit(""))),
          lit("/$"), lit("")).as("curl"))
      .groupBy("curl")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_dups"))
  }

  /** A22 — exact-decimal money aggregation: prices cast to DECIMAL(12,2)
    * and summed exactly — no rnd() scaffold, the hashes match because the
    * arithmetic is exact in both engines. At scale, decimal sums are
    * Spark's 128-bit unscaled-long path: map-side partials, no FP drift
    * across any partitioning, the audit-grade money path. */
  val a22DecimalExact = q("a22_decimal_exact",
    """SELECT l_returnflag,
      |       sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_price,
      |       sum(CAST(l_discount AS DECIMAL(4,2))) AS sum_disc,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("sum_price"),
        sum(col("l_discount").cast("decimal(4,2)")).as("sum_disc"),
        count(lit(1)).as("n"))
  }

  /** T26 — syllable-proxy readability grade (FKGL-style on a corpus with
    * no sentence punctuation): words and vowel-group "syllables" via
    * regexp_count, grade = 0.39·words + 11.8·syll/word − 15.59. Array-
    * local per doc, zero shuffle — a standard quality-screen column. */
  val t26Readability = q("t26_readability",
    s"""SELECT doc_id,
       |       len(regexp_extract_all(text, '[a-z]+')) AS n_words,
       |       len(regexp_extract_all(text, '[aeiou]+')) AS n_syll,
       |       ${rnd("""CASE WHEN len(regexp_extract_all(text, '[a-z]+')) > 0
       |            THEN 0.39e0 * len(regexp_extract_all(text, '[a-z]+'))
       |                 + 11.8e0 * len(regexp_extract_all(text, '[aeiou]+'))
       |                        / len(regexp_extract_all(text, '[a-z]+'))
       |                 - 15.59e0 ELSE 0.0e0 END""".stripMargin.replace("\n", " "), 3)} AS grade
       |FROM documents""".stripMargin) { (s, d) =>
    val words = regexp_count(col("text"), lit("[a-z]+"))
    val syll = regexp_count(col("text"), lit("[aeiou]+"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        words.cast("long").as("n_words"), syll.cast("long").as("n_syll"),
        round(when(words > 0,
          lit(0.39) * words + lit(11.8) * syll / words - lit(15.59))
          .otherwise(0.0), 3).as("grade"))
  }

  /** G12 — time-bounded conversion funnel: users whose first signup is
    * followed by a purchase within one hour. The deadline predicate makes
    * this a range join — bounded per user by the first-signup row, so the
    * join's left side is |signup users|, never |events|². */
  val g12ConversionWindow = q("g12_conversion_window",
    s"""WITH s AS (
       |  SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |conv AS (
       |  SELECT DISTINCT s.user_id
       |  FROM s JOIN events e ON e.user_id = s.user_id
       |   AND e.event_type = 'purchase'
       |   AND e.ts > s.t0 AND e.ts <= s.t0 + INTERVAL 1 HOUR)
       |SELECT (SELECT count(*) FROM s) AS n_signup_users,
       |       (SELECT count(*) FROM conv) AS n_converted,
       |       ${rnd("100.0 * (SELECT count(*) FROM conv) / (SELECT count(*) FROM s)", 4)}
       |         AS conv_pct""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val signups = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t0"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
    val conv = signups.join(purch,
        col("p_uid") === col("user_id") && col("p_ts") > col("t0") &&
          col("p_ts") <= col("t0") + expr("INTERVAL 1 HOUR"), "left_semi")
      .agg(count(lit(1)).as("n_converted"))
    signups.agg(count(lit(1)).as("n_signup_users"))
      .crossJoin(broadcast(conv))
      .select(col("n_signup_users"), col("n_converted"),
        round(lit(100.0) * col("n_converted") / col("n_signup_users"), 4)
          .as("conv_pct"))
  }

  val all: Seq[Q] = Seq(sqlRecursiveCte, f34UrlParse, d18UrlDedup,
    a22DecimalExact, t26Readability, g12ConversionWindow)
}
