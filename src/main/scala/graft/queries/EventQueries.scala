package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream operators (SURVEY.md §2.9) in their deterministic batch
  * form — the same transforms run under Structured Streaming in
  * graft.streaming.EventStream (watermark + windowed agg + stateful
  * sessionization); the batch versions here are the oracle-checkable
  * semantics.
  */
object EventQueries {

  /** E1 — tumbling event-time window aggregate (1h), the
    * withWatermark+window shape. */
  val e1WindowAgg = q("e1_window_agg",
    s"""SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       ${rnd("sum(value)", 2)} AS total_value,
      |       ${rnd("avg(value)", 4)} AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"),
        round(avg("value"), 4).as("avg_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"), col("avg_value"))
  }

  /** E2 — gap-based sessionization (30 min): the
    * flatMapGroupsWithState-shape computed deterministically with window
    * functions (integer microsecond arithmetic — engine-portable). */
  val e2Sessionize = q("e2_sessionize",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tus,
      |         lag(epoch_us(ts::TIMESTAMP)) OVER (
      |           PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC) AS prev
      |  FROM events),
      |marked AS (
      |  SELECT user_id, event_id, tus,
      |         CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_start
      |  FROM seq),
      |sess AS (
      |  SELECT user_id, event_id,
      |         sum(is_start) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       min(event_id) AS first_event_id
      |FROM sess GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val ordered = Window.partitionBy("user_id").orderBy(col("tus").asc, col("event_id").asc)
    val marked = ev
      .withColumn("prev", lag("tus", 1).over(ordered))
      .withColumn("is_start",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1).otherwise(0))
    val sess = marked.withColumn("session_id",
      sum("is_start").over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("event_id").as("first_event_id"))
      .select(col("user_id"), col("session_id").cast("bigint").as("session_id"),
        col("n_events"), col("first_event_id"))
  }

  /** E3 — nested-JSON flatten (API-response shape, dataingestion1.py:83-92):
    * extract + cast + derive. */
  val e3JsonFlatten = q("e3_json_flatten",
    s"""SELECT event_id,
      |       CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
      |       ${rnd("CAST(json_extract_string(props, '$.k') AS BIGINT) * value", 4)} AS k_weighted
      |FROM events""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("bigint")
    Tables.events(s, d).select(col("event_id"), k.as("k"),
      round(k * col("value"), 4).as("k_weighted"))
  }

  /** M1 — multimodal/binary column plumbing: text → binary payload with
    * typed metadata (byte length + content hash) — the schema/partitioning
    * half of the image/audio path; decode itself is the stubbed part
    * (graft.multimodal.BinaryOps). */
  val m1BinaryMeta = q("m1_binary_meta",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(length(text) AS BIGINT) AS n_chars_check
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"),
      md5(col("text")).as("content_md5"),
      length(col("text")).cast("bigint").as("n_chars_check"))
  }

  /** M2 — strided frame sampling (the video half of the multimodal path,
    * graft.multimodal.BinaryOps.sampleFrames): each document's token
    * sequence stands in for a frame sequence; keep every 5th frame and
    * emit (frame index, frame hash). The kept indices are GENERATED
    * (sequence with stride) rather than filtered post-explode — at video
    * scale the decode never runs on dropped frames. */
  val m2FrameSample = q("m2_frame_sample",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |fr AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 5)) AS fidx FROM tok)
      |SELECT doc_id, CAST(fidx - 1 AS INT) AS frame_idx, md5(t[fidx]) AS frame_md5
      |FROM fr""".stripMargin) { (s, d) =>
    val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("fidx", explode(sequence(lit(1), size(col("t")), lit(5))))
      .select(col("doc_id"), (col("fidx") - 1).cast("int").as("frame_idx"),
        md5(element_at(col("t"), col("fidx"))).as("frame_md5"))
  }

  /** E4 — SLIDING event-time window (1h window, 15min slide): every event
    * lands in 4 overlapping windows. Oracle replicates Spark's
    * epoch-aligned window assignment with explicit integer µs arithmetic
    * (no engine-specific bucket-origin assumptions). */
  val e4SlidingWindow = q("e4_sliding_window",
    s"""SELECT strftime(make_timestamp((epoch_us(ts::TIMESTAMP) // 900000000 - i.i) * 900000000),
      |                '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       ${rnd("sum(value)", 2)} AS total_value
      |FROM events CROSS JOIN range(0, 4) i(i)
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** E5 — as-of join: each click matched to the user's latest purchase
    * at-or-before it. Spark-side: graft.ops.AsOfJoin (union + window
    * carry-forward, linear cost). Oracle: DuckDB's NATIVE ASOF LEFT JOIN
    * — an independent implementation of the same semantics. */
  val e5AsOfJoin = q("e5_asof_join",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |  WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id AS p_event_id, user_id, ts::TIMESTAMP AS ts, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id,
      |       p.p_event_id AS asof_p_event_id,
      |       p.p_value AS asof_p_value
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"),
        col("value").as("p_value"))
    graft.ops.AsOfJoin.asOf(clicks, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"))
      .select("event_id", "user_id", "asof_p_event_id", "asof_p_value")
  }

  /** E6 — pivot: event counts per user wide by event type (explicit
    * value list ⇒ deterministic schema; Spark .pivot ≡ CASE-aggregation). */
  val e6Pivot = q("e6_pivot",
    """SELECT user_id,
      |       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
      |       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
      |       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
      |       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
      |       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id") +: types.map(t => col(t).as(s"n_$t")): _*)
  }

  /** E7 — binned range join: pairs (error, click) of the same user with
    * the click in the 10 minutes before the error. A naive inequality
    * join plans as BroadcastNestedLoop (quadratic); binning by the range
    * width turns it into an equi-join on (user, bin) ∪ (user, bin-1) +
    * residual filter — the 100 TB interval-join shape. */
  val e7RangeJoin = q("e7_range_join",
    """SELECT e.event_id AS error_id, c.event_id AS click_id
      |FROM (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS tus
      |      FROM events WHERE event_type = 'error') e
      |JOIN (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS tus
      |      FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id
      | AND c.tus >= e.tus - 600000000 AND c.tus < e.tus""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("tus").as("e_tus"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tus").as("c_tus"))
    // exact integer binning (div, not double /): each error probes its
    // own bin and the previous one
    val e2bins = errors.withColumn("bin",
      explode(array(expr("e_tus div 600000000"), expr("e_tus div 600000000 - 1"))))
    val cbinned = clicks.withColumn("bin", expr("c_tus div 600000000"))
    e2bins.join(cbinned, Seq("user_id", "bin"))
      .where(col("c_tus") >= col("e_tus") - 600000000L && col("c_tus") < col("e_tus"))
      .select("error_id", "click_id")
      .distinct()
  }

  val all: Seq[Q] = Seq(e1WindowAgg, e2Sessionize, e3JsonFlatten,
    e4SlidingWindow, e5AsOfJoin, e6Pivot, e7RangeJoin, m1BinaryMeta,
    m2FrameSample)
}
