package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Metrics, TitleCode}
import graft.functions.SecondsToHms
import graft.sinks.Warehouse

/** Scalar-function battery — SURVEY.md §2.8 F1–F22, each driven with
  * deterministic synthetic variation built from the testdata so every
  * branch executes (upper/lower/digit/length cases, invalid dates,
  * >24h durations, zero denominators).
  */
object Scalars {

  /** F1–F7 — the full title-code parse chain. Candidate codes are
    * constructed from part names to hit every purge branch: raw lowercase
    * (multi-lowercase purge), upper (valid), digits (digit purge), and a
    * 4-char prefix case. */
  val fTitleCode = q("f_titlecode",
    """WITH base AS (
      |  SELECT p_partkey,
      |         list_extract(list_filter(string_split_regex(trim(replace(p_name, '|', ' ')), '\s+'),
      |                                  x -> x <> ''), -1) AS lastword
      |  FROM part),
      |cand AS (
      |  SELECT p_partkey,
      |         CASE p_partkey % 4
      |           WHEN 0 THEN upper(lastword)
      |           WHEN 1 THEN lastword
      |           WHEN 2 THEN CAST(p_partkey AS VARCHAR)
      |           ELSE substr(upper(lastword) || 'XXXX', 1, 4) END AS main_code_raw
      |  FROM base),
      |purged AS (
      |  SELECT p_partkey, main_code_raw,
      |         CASE WHEN length(main_code_raw) NOT IN (3,4,5) THEN ''
      |              WHEN regexp_full_match(main_code_raw, '[0-9]+') THEN ''
      |              WHEN length(regexp_replace(main_code_raw, '[^a-z]', '', 'g')) > 1 THEN ''
      |              ELSE main_code_raw END AS main_code
      |  FROM cand)
      |SELECT p_partkey, main_code_raw, main_code,
      |       CASE WHEN main_code = '' THEN ''
      |            WHEN length(main_code) = 4 THEN substr(main_code, 1, 2)
      |            ELSE substr(main_code, 1, 3) END AS code,
      |       CASE WHEN main_code = '' THEN ''
      |            ELSE substr(main_code, length(main_code), 1) END AS resource_code
      |FROM purged""".stripMargin) { (s, d) =>
    val lastword = TitleCode.extractLastWord(col("p_name"))
    val candRaw = when(col("p_partkey") % 4 === 0, upper(lastword))
      .when(col("p_partkey") % 4 === 1, lastword)
      .when(col("p_partkey") % 4 === 2, col("p_partkey").cast("string"))
      .otherwise(substring(concat(upper(lastword), lit("XXXX")), 1, 4))
    Tables.part(s, d)
      .withColumn("main_code_raw", candRaw)
      .withColumn("main_code", TitleCode.purgeInvalid(col("main_code_raw")))
      .withColumn("code", TitleCode.codePrefix(col("main_code")))
      .withColumn("resource_code", TitleCode.lastChar(col("main_code")))
      .select("p_partkey", "main_code_raw", "main_code", "code", "resource_code")
  }

  /** F9/F13 — lenient parsing with defaults: invalid dates → sentinel,
    * uncastable ints → 0 (normalize_date_safe + int(x or 0)). */
  val f9SafeCast = q("f9_safe_cast",
    """SELECT event_id,
      |       strftime(coalesce(try_cast(CASE event_id % 4
      |           WHEN 0 THEN '2024-01-15' WHEN 1 THEN 'garbage'
      |           WHEN 2 THEN '2024-02-30' ELSE '' END AS DATE),
      |         DATE '2024-01-01'), '%Y-%m-%d') AS safe_date,
      |       CAST(coalesce(try_cast(CASE event_id % 3
      |           WHEN 0 THEN CAST(event_id AS VARCHAR)
      |           WHEN 1 THEN 'NaN-ish' ELSE '' END AS BIGINT), 0) AS BIGINT) AS safe_int
      |FROM events""".stripMargin) { (s, d) =>
    val dirtyDate = when(col("event_id") % 4 === 0, lit("2024-01-15"))
      .when(col("event_id") % 4 === 1, lit("garbage"))
      .when(col("event_id") % 4 === 2, lit("2024-02-30"))
      .otherwise(lit(""))
    val dirtyInt = when(col("event_id") % 3 === 0, col("event_id").cast("string"))
      .when(col("event_id") % 3 === 1, lit("NaN-ish"))
      .otherwise(lit(""))
    Tables.events(s, d).select(col("event_id"),
      date_format(Metrics.safeDate(dirtyDate), "yyyy-MM-dd").as("safe_date"),
      coalesce(dirtyInt.try_cast("bigint"), lit(0L)).as("safe_int"))
  }

  /** F10/F21 — UTC → Asia/Karachi (fixed +05:00, no DST) local date/time
    * split (dataprocessing3.py:28-40). The oracle adds the literal offset;
    * the engine uses the tz database — identical for this zone. */
  val f10Tz = q("f10_tz_convert",
    """SELECT event_id,
      |       strftime(ts::TIMESTAMP + INTERVAL 5 HOUR, '%Y-%m-%d') AS local_date,
      |       strftime(ts::TIMESTAMP + INTERVAL 5 HOUR, '%H:%M:%S') AS local_time
      |FROM events""".stripMargin) { (s, d) =>
    val (ld, lt) = Metrics.toLocal(col("ts"))
    Tables.events(s, d).select(col("event_id"), ld.as("local_date"), lt.as("local_time"))
  }

  /** F12 — seconds → Python str(timedelta) parity incl. `N days, H:MM:SS`
    * past 24h — via the custom codegen Expression SecondsToHms. */
  val f12Hms = q("f12_seconds_hms",
    """WITH s AS (SELECT event_id, (event_id * 7919) % 200000 AS secs FROM events)
      |SELECT event_id, secs,
      |       CASE WHEN secs // 86400 = 0 THEN fmt
      |            WHEN secs // 86400 = 1 THEN '1 day, ' || fmt
      |            ELSE (secs // 86400) || ' days, ' || fmt END AS hms
      |FROM (SELECT event_id, secs,
      |             ((secs % 86400) // 3600) || ':' ||
      |             lpad(CAST((secs % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
      |             lpad(CAST(secs % 60 AS VARCHAR), 2, '0') AS fmt
      |      FROM s)""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("secs", (col("event_id") * 7919) % 200000)
      .select(col("event_id"), col("secs"),
        SecondsToHms.secondsToHms(col("secs")).as("hms"))
  }

  /** F11/F14–F17 — derived metrics with zero-denominator guards:
    * engagement-rate / CPV / RPM shapes (dataprocessing3.py:68-102). */
  private val cpvSql =
    "CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity ELSE 0 END"
  val f15Rates = q("f15_derived_rates",
    s"""SELECT l_orderkey, l_linenumber,
      |       ${rnd("l_quantity / 60.0", 2)} AS hours_analog,
      |       ${rnd("CASE WHEN l_quantity > 0 THEN (l_tax + l_discount) / l_quantity * 100 ELSE 0 END", 2)} AS rate,
      |       ${rnd(cpvSql, 6)} AS cpv,
      |       ${rnd(s"(${rnd(cpvSql, 6)}) * 1000", 2)} AS rpm,
      |       CAST(l_linenumber - l_orderkey AS BIGINT) AS net
      |FROM lineitem""".stripMargin) { (s, d) =>
    val cpvCol = Metrics.cpv(col("l_extendedprice"), col("l_quantity"))
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      Metrics.minutesToHours(col("l_quantity")).as("hours_analog"),
      Metrics.engagementRate(col("l_tax"), col("l_discount"), lit(0), col("l_quantity")).as("rate"),
      cpvCol.as("cpv"),
      Metrics.rpm(cpvCol).as("rpm"),
      Metrics.net(col("l_linenumber").cast("bigint"), col("l_orderkey")).as("net"))
  }

  /** F19/F20 — identifier sanitize + all-string warehouse cast
    * (ingestdatainbigquery.py:37-46,127). Doubles go through DECIMAL(18,2)
    * so both engines render identical strings. */
  val f19Sanitize = q("f19_sanitize_allstring",
    """SELECT CAST(o_orderkey AS VARCHAR) AS o_order_key,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_price,
      |       strftime(o_orderdate::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS order_date,
      |       CAST(o_orderstatus AS VARCHAR) AS status
      |FROM orders""".stripMargin) { (s, d) =>
    val dirty = Tables.orders(s, d).select(
      col("o_orderkey").as("  O Order-Key! "),
      col("o_totalprice").cast("decimal(18,2)").as("Total Price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("Order  Date"),
      col("o_orderstatus").as("status"))
    Warehouse.allString(Warehouse.sanitizeColumns(dirty))
  }

  /** F13 — the reference's all-or-nothing row blanking: if ANY numeric
    * input of a row fails to parse, ALL derived columns of that row go
    * blank; empty string counts as 0, garbage is an error
    * (int(x or 0) + ValueError handler, dataprocessing3.py:50-55,93-97). */
  val f13RowBlanking = q("f13_row_blanking",
    """WITH dirty AS (
      |  SELECT event_id,
      |         CASE event_id % 5 WHEN 0 THEN 'xx'
      |              WHEN 1 THEN '' ELSE CAST(event_id % 100 AS VARCHAR) END AS g,
      |         CASE event_id % 7 WHEN 0 THEN 'oops' ELSE '3' END AS l
      |  FROM events),
      |parsed AS (
      |  SELECT event_id,
      |         CASE WHEN g = '' THEN 0 ELSE try_cast(g AS BIGINT) END AS gi,
      |         CASE WHEN l = '' THEN 0 ELSE try_cast(l AS BIGINT) END AS li
      |  FROM dirty)
      |SELECT event_id,
      |       CASE WHEN gi IS NULL OR li IS NULL THEN ''
      |            ELSE CAST(gi - li AS VARCHAR) END AS net,
      |       CASE WHEN gi IS NULL OR li IS NULL THEN ''
      |            ELSE CAST(gi + li AS VARCHAR) END AS total
      |FROM parsed""".stripMargin) { (s, d) =>
    val g = when(col("event_id") % 5 === 0, lit("xx"))
      .when(col("event_id") % 5 === 1, lit(""))
      .otherwise((col("event_id") % 100).cast("string"))
    val l = when(col("event_id") % 7 === 0, lit("oops")).otherwise(lit("3"))
    val gi = when(g === "", lit(0L)).otherwise(g.try_cast("bigint"))
    val li = when(l === "", lit(0L)).otherwise(l.try_cast("bigint"))
    val rowValid = gi.isNotNull && li.isNotNull
    Tables.events(s, d).select(col("event_id"),
      when(!rowValid, lit("")).otherwise((gi - li).cast("string")).as("net"),
      when(!rowValid, lit("")).otherwise((gi + li).cast("string")).as("total"))
  }

  /** P2/S4 — drop rows that are null in every (payload) column
    * (dropna(how=all), dataingestion2.py:30). Nulls are injected
    * deterministically, then na.drop("all") over the payload columns. */
  val p2DropAllNull = q("p2_drop_all_null",
    """WITH sparse AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS a,
      |         CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END AS b
      |  FROM orders)
      |SELECT o_orderkey, coalesce(a, '') AS a, coalesce(b, '') AS b
      |FROM sparse WHERE a IS NOT NULL OR b IS NOT NULL""".stripMargin) { (s, d) =>
    val sparse = Tables.orders(s, d).select(col("o_orderkey"),
      when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_orderstatus")).as("a"),
      when(col("o_orderkey") % 2 === 0, lit(null)).otherwise(col("o_orderpriority")).as("b"))
    sparse.na.drop("all", Seq("a", "b"))
      .select(col("o_orderkey"), coalesce(col("a"), lit("")).as("a"),
        coalesce(col("b"), lit("")).as("b"))
  }

  val all: Seq[Q] = Seq(fTitleCode, f9SafeCast, f10Tz, f12Hms, f13RowBlanking,
    f15Rates, f19Sanitize, p2DropAllNull)
}
