package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 widening, part 57: the native streaming watermark-dedup
  * operator promoted from spec-only to a hash-checked ENGINE execution —
  * the last §2.9 row that had no battery entry of its own (c4 covers the
  * hand-rolled keyed-state debounce; this is Spark's built-in
  * `dropDuplicatesWithinWatermark`).
  */
object Extended57 {

  /** C20 — `dropDuplicatesWithinWatermark` executed by the STREAMING
    * ENGINE: events replay through a MemoryStream in 4 micro-batches into
    * [[graft.streaming.EventStream.dedupStream]] and the memory sink's
    * accumulated output is the result; the oracle is the batch keep-first
    * window (row_number = 1 per user by event time).
    *
    * Replay discipline makes the survivor deterministic: each user's
    * events are ordered by (ts, event_id) and the k-th occurrence goes to
    * micro-batch min(k, 3) — so batch 0 carries exactly each user's FIRST
    * event (one row per key: no within-batch arrival races, whose winner
    * the operator leaves unspecified), and every later batch carries only
    * duplicates, each of which must be dropped via a cross-batch state
    * lookup. The watermark delay (400 days) exceeds the replayed span, so
    * no state expires mid-replay and the engine's semantics are exactly
    * the oracle's keep-first; the production-shaped 4-day delay is the
    * operator's default (reference's analytics settling lag,
    * dataingestion1.py:118-121).
    *
    * Scale: state is one row per distinct key, evicted by watermark — the
    * bounded-state form of W1's batch dedup; the driver-side collect is
    * MemoryStream-inherent (the production path is readStream). */
  val c20StreamDedupWatermark = q("c20_stream_dedup_watermark",
    """SELECT event_id, user_id, event_type FROM (
      |  SELECT event_id, user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.DebEvent
    val rows = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[DebEvent]
      .collect()
    val nBatches = 3 // first batch holds every user's keeper; 2 duplicate batches exercise cross-batch suppression
    val batches = Array.fill(nBatches)(Vector.newBuilder[DebEvent])
    rows.groupBy(_.user_id).valuesIterator.foreach { evs =>
      evs.sortBy(e => (e.tsMicros, e.event_id)).zipWithIndex.foreach {
        case (e, i) => batches(math.min(i, nBatches - 1)) += e
      }
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DebEvent]
    val sinkName = memorySinkName(s, "c20_dedup_")
    withShufflePartitions(s, 4) {
      val stream = source.toDS()
        .withColumn("ts", timestamp_micros(col("tsMicros")))
      val query = EventStream.dedupStream(stream, "400 days")
        .select("event_id", "user_id", "event_type")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .start()
      try {
        batches.foreach { b =>
          source.addData(b.result())
          query.processAllAvailable()
        }
      } finally query.stop()
    }
    s.table(sinkName).select("event_id", "user_id", "event_type")
  }

  /** C21 — epoch COMPACTION on the atomic warehouse: three drained epochs
    * are folded into one pre-merged dir ([[graft.sinks.AtomicWarehouse
    * .compact]]), then a post-compaction drain lands on top — and the
    * snapshot read must be indistinguishable from never having compacted
    * (the oracle replays all four epochs' keep-last merge directly).
    * Surviving rows keep their original load_seq through the fold, which
    * is exactly why later drains still win the merge.
    *
    * Scale: compaction is the maintenance pass that keeps read planning
    * O(1) in drain count — the fold rewrites only LIVE rows (dead
    * versions drop out), and everything before it stays time-travelable
    * until a retention vacuum. */
  val c21AtomicCompaction = q("c21_atomic_compaction",
    """WITH e1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         c_mktsegment, CAST(1 AS BIGINT) AS load_seq
      |  FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         'REFETCHED' AS c_mktsegment, CAST(2 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey < 10),
      |e3 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         'POST' AS c_mktsegment, CAST(3 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey >= 20),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
      |SELECT c_custkey, c_name, c_mktsegment, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c21") + "/wh"
    val cust = Tables.customer(s, d)
    def ep(seq: Long, dfv: org.apache.spark.sql.DataFrame): Unit =
      AtomicWarehouse.commitEpoch(s, wh,
        dfv.select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_mktsegment"), lit(seq).as("load_seq")), seq)
    ep(1L, cust)
    ep(2L, cust.where(col("c_nationkey") < 10)
      .withColumn("c_mktsegment", lit("REFETCHED")))
    AtomicWarehouse.compact(s, wh, "c_custkey")
    ep(3L, cust.where(col("c_nationkey") >= 20)
      .withColumn("c_mktsegment", lit("POST")))
    AtomicWarehouse.read(s, wh, "c_custkey")
      .select("c_custkey", "c_name", "c_mktsegment", "load_seq")
  }

  /** C22 — stream-stream LEFT OUTER interval join on the ENGINE: every
    * error row emits, null-padded when no same-user click precedes it
    * within 10 minutes ([[graft.streaming.EventStream.clickErrorLeftJoin]]).
    * This is the harder join contract than c5's inner form: an unmatched
    * error may only emit once the click-side watermark proves no matching
    * click can still arrive, so the result depends on watermark-driven
    * STATE EVICTION, not just retention. The replay appends two
    * successively-later flush sentinels (user_id −1, filtered back out):
    * the first advances the watermark past all real data, the second
    * gives the engine the batch in which that watermark evicts-and-emits
    * the remaining unmatched errors — the end-of-stream drain for outer
    * joins. Oracle: the batch LEFT JOIN with the same interval.
    *
    * Scale: state on each side is bounded by the interval + watermark
    * delay exactly as in c5; outer emission adds no state, only the
    * eviction-time null-pad. */
  val c22StreamLeftOuterJoin = q("c22_stream_left_outer_join",
    """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON c.user_id = e.user_id
      | AND c.ts::TIMESTAMP >= e.ts::TIMESTAMP - INTERVAL 10 MINUTE
      | AND c.ts::TIMESTAMP < e.ts::TIMESTAMP""".stripMargin) { (s, d) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables.events(s, d)
      .where(col("event_type").isin("click", "error"))
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect()
      .sortBy(r => (r._1, r._2))
    val maxUs = rows.last._1
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val ev = source.toDF().toDF("us", "event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val joined = graft.streaming.EventStream.clickErrorLeftJoin(
      ev.where(col("event_type") === "click"),
      ev.where(col("event_type") === "error"))
    val sinkName = memorySinkName(s, "c22_louter_")
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndOld = s.conf.getOption(ndKey)
    s.conf.set(ndKey, "false") // flush is driven by the explicit sentinels
    try withShufflePartitions(s, 2) {
      val query = joined.writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        val nBatches = 3 // open/cross/flush state transitions; extra batches are pure trigger wall-clock
        val per = (rows.length + nBatches - 1) / nBatches
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
        for (day <- 1L to 2L) {
          val us = maxUs + day * 86400L * 1000000
          source.addData(Seq((us, -1L, -1L, "click"), (us, -1L, -1L, "error")))
          query.processAllAvailable()
        }
      } finally query.stop()
    } finally ndOld match {
      case Some(v) => s.conf.set(ndKey, v)
      case None => s.conf.unset(ndKey)
    }
    s.table(sinkName).where(col("user_id") >= 0)
      .select("error_id", "click_id", "user_id")
  }

  /** C23 — EPOCH SKIPPING on the atomic warehouse's range read: each
    * committed epoch's manifest entry carries min/max stats of the merge
    * key, and `readRange` opens only epochs whose range intersects the
    * query's — the Parquet zone-map idea lifted to the epoch level, where
    * it prunes the scan, the union AND the merge shuffle (sound exactly
    * because the stats column is the merge key; see the readRange
    * scaladoc). Here the HOT epoch (top of the key space) is disjoint
    * from the queried bottom decile, so it is never opened; the oracle
    * replays all three epochs unpruned and filters — results must match
    * bit-for-bit. AtomicWarehouseSpec pins that the disjoint epoch is
    * genuinely absent from the scan list.
    *
    * Scale: at 100 TB with key-partitioned drains this is the difference
    * between a range lookup touching one epoch and re-merging the whole
    * warehouse. */
  val c23EpochRangeSkipping = q("c23_epoch_range_skipping",
    """WITH mx AS (SELECT CAST(max(c_custkey) AS BIGINT) AS m FROM customer),
      |e1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         c_mktsegment, CAST(1 AS BIGINT) AS load_seq
      |  FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         'LOW' AS c_mktsegment, CAST(2 AS BIGINT) AS load_seq
      |  FROM customer, mx WHERE c_custkey <= m // 10),
      |e3 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         'HOT' AS c_mktsegment, CAST(3 AS BIGINT) AS load_seq
      |  FROM customer, mx
      |  WHERE c_custkey BETWEEN (m * 6) // 10 AND (m * 8) // 10),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
      |SELECT c_custkey, c_name, c_mktsegment, load_seq FROM (
      |  SELECT u.*, row_number() OVER (PARTITION BY c_custkey
      |                                 ORDER BY load_seq DESC) AS rn
      |  FROM u), mx WHERE rn = 1 AND c_custkey BETWEEN 1 AND m // 10""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c23") + "/wh"
    val cust = Tables.customer(s, d)
    val m = cust.agg(max(col("c_custkey").cast("long"))).head.getLong(0)
    def ep(seq: Long, dfv: org.apache.spark.sql.DataFrame, seg: Option[String]): Unit =
      AtomicWarehouse.commitEpoch(s, wh,
        dfv.select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          seg.map(lit(_)).getOrElse(col("c_mktsegment")).as("c_mktsegment"),
          lit(seq).as("load_seq")),
        seq, statsKey = Some("c_custkey"))
    ep(1L, cust, None)
    ep(2L, cust.where(col("c_custkey") <= m / 10), Some("LOW"))
    ep(3L, cust.where(col("c_custkey").between(m * 6 / 10, m * 8 / 10)), Some("HOT"))
    AtomicWarehouse.readRange(s, wh, "c_custkey", 1L, m / 10)
      .select("c_custkey", "c_name", "c_mktsegment", "load_seq")
  }

  /** C24 — ADDITIVE SCHEMA EVOLUTION across warehouse epochs: the second
    * drain carries a column the first never had (the reference's sheet
    * grows columns over time — K5's header-ensure is exactly this), and
    * the snapshot read surfaces it as null for rows whose winning version
    * predates the column. No epoch is ever rewritten: evolution is purely
    * a read-side unionByName(allowMissingColumns) over immutable dirs.
    *
    * Scale: widening a 100 TB warehouse costs nothing at write time and
    * one null-fill projection at read time — the alternative (rewrite
    * every historical epoch) is the full-warehouse I/O the log-structured
    * layout exists to avoid. */
  val c24EpochSchemaEvolution = q("c24_epoch_schema_evolution",
    """WITH e1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         CAST(NULL AS VARCHAR) AS c_mktsegment,
      |         CAST(1 AS BIGINT) AS load_seq
      |  FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      |         c_mktsegment, CAST(2 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey < 10),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
      |SELECT c_custkey, c_name, c_mktsegment, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c24") + "/wh"
    val cust = Tables.customer(s, d)
    AtomicWarehouse.commitEpoch(s, wh,
      cust.select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        lit(1L).as("load_seq")), 1L)
    AtomicWarehouse.commitEpoch(s, wh,
      cust.where(col("c_nationkey") < 10)
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_mktsegment"), lit(2L).as("load_seq")), 2L)
    AtomicWarehouse.read(s, wh, "c_custkey")
      .select("c_custkey", "c_name", "c_mktsegment", "load_seq")
  }

  /** C25 — sessionization closed by ENGINE EVENT-TIME TIMERS
    * ([[graft.streaming.EventStream.sessionizeTimers]]): c7 flushes the
    * trailing sessions with per-user sentinel EVENTS; here each open
    * session instead registers a timer at (last event + 30 min) and the
    * engine fires the `hasTimedOut` callback once the watermark passes it
    * — the production mechanism for "session ends after N quiet minutes"
    * (no future event required). One far-future row for a dummy user
    * pushes the watermark at end-of-stream; every REAL user's trailing
    * session then emits through the timer path, so the battery covers
    * timer registration, watermark-driven firing, and the timed-out
    * branch — none of which c7's sentinel replay exercises. Oracle: the
    * identical declarative lag/cumsum sessionization.
    *
    * Scale: state stays one open session per user; timers add one
    * timestamp per key to the state store. */
  val c25StreamSessionTimers = q("c25_stream_session_timers",
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
      |  SELECT user_id, tus,
      |         sum(is_start) OVER (PARTITION BY user_id ORDER BY tus ASC, event_id ASC
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(tus) AS BIGINT) AS last_us
      |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.streaming.EventStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(r => (r._3, r._2))
    val flushUs = rows.map(_._3).max + 10L * 86400 * 1000000
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val stream = source.toDF().toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .as[EventStream.TimedEvent]
    val sinkName = memorySinkName(s, "c25_sink_")
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndOld = s.conf.getOption(ndKey)
    s.conf.set(ndKey, "true") // the timeout sweep runs in the post-watermark batch
    try withShufflePartitions(s, 4) {
      // delay 0 is sound ONLY because the replay feeds globally ts-sorted
      // chunks (no event ever arrives below the watermark); a real source
      // sets the delay to its out-of-orderness — see sessionizeTimers doc
      val query = EventStream.sessionizeTimers(stream,
        watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        val per = (rows.length + 2) / 3 // 3 data batches: open/cross/flush state transitions
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
        // one dummy-user row pushes the watermark past every real
        // session's timer; the engine then fires hasTimedOut for each
        source.addData(Seq((-1L, -1L, flushUs)))
        query.processAllAvailable()
      } finally query.stop()
    } finally ndOld match {
      case Some(v) => s.conf.set(ndKey, v)
      case None => s.conf.unset(ndKey)
    }
    s.table(sinkName).where(col("user_id") >= 0)
      .select(col("user_id"), col("session_events").as("n_events"),
        col("last_micros").as("last_us"))
  }

  /** C26 — CHECKPOINT RESTART RECOVERY end-to-end: the watermarked window
    * aggregate runs against a checkpoint, is STOPPED cold mid-stream, and
    * a NEW query object resumes from the same checkpoint to finish the
    * replay — offsets, watermark, and window state must all recover for
    * the final warehouse to hash-match the batch GROUP BY. Emission goes
    * through the exactly-once foreachBatch sink (batchId-keyed immutable
    * epochs, c19's pattern), so the batch Spark re-runs around the stop
    * point commits exactly once. This is the engine contract every
    * production streaming job leans on and no other battery entry
    * executes: recovery is from the CHECKPOINT, not live driver state.
    *
    * Scale: checkpoint size tracks state (open windows), not history;
    * restart cost is state-store reload. */
  val c26StreamRestartRecovery = q("c26_stream_restart_recovery",
    s"""SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
       |       event_type, CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("sum(value)", 2)} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.sinks.AtomicWarehouse
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = freshScratch("c26")
    val warehouse = s"$base/warehouse"
    val checkpoint = s"$base/checkpoint"
    val rows = Tables.events(s, d)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
    val maxUs = rows.last._1
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Double)]
    def startQuery() = graft.streaming.EventStream.windowedAgg(
        source.toDF().toDF("us", "event_id", "event_type", "value")
          .withColumn("ts", timestamp_micros(col("us"))))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // append mode emits each (window, type) exactly once across the
        // whole run — the merge key exists to satisfy the warehouse read
        AtomicWarehouse.commitEpoch(s, warehouse,
          batch.withColumn("k", concat(col("window_start").cast("string"),
              lit("|"), col("event_type")))
            .withColumn("load_seq", lit(id)), id)
      }
      .start()
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq // 2 pre-restart + 1 post-restart
    withShufflePartitions(s, 4) {
      val q1 = startQuery()
      try {
        chunks.take(2).foreach { c =>
          source.addData(c.toIndexedSeq); q1.processAllAvailable()
        }
      } finally q1.stop() // the cold stop: driver-side query state is gone
      val q2 = startQuery() // recovery happens from the checkpoint alone
      try {
        chunks.drop(2).foreach { c =>
          source.addData(c.toIndexedSeq); q2.processAllAvailable()
        }
        source.addData(Seq((maxUs + 10L * 86400 * 1000000, -1L, "__flush", 0.0)))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    AtomicWarehouse.read(s, warehouse, "k")
      .where(col("event_type") =!= "__flush")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), round(col("total_value"), 2).as("total_value"))
  }

  /** S11 — DSv2 WRITE path with the two-phase commit protocol: video
    * rows derived from orders are written THROUGH the `graft-videos`
    * connector (each task stages a hidden JSONL temp, the job commit
    * renames them visible; abort leaves the destination untouched —
    * [[graft.sources.v2.VideoWriteBuilder]]) and read back through the
    * same connector's scan. The oracle derives the rows directly from
    * orders, so the hash pins the serialize→commit→load round-trip; the
    * abort/no-torn-append behavior is pinned by VideoSinkSpec. This is
    * the engine artifact for the reference's append-to-sheet path
    * (dataingestion1.py:185-204), which has no crash story at all.
    *
    * Scale: tasks write independently and the job commit is one rename
    * per task file — the same O(tasks) driver cost as any cloud-storage
    * commit protocol; a production impl swaps file I/O for the batch
    * append API and keeps the protocol. */
  val s11Dsv2Write = q("s11_dsv2_write",
    """SELECT 'v' || CAST(o_orderkey AS VARCHAR) AS video_id,
      |       o_orderpriority AS video_title,
      |       strftime(TIMESTAMP '2020-01-01 00:00:00' + to_seconds(o_orderkey),
      |                '%Y-%m-%dT%H:%M:%SZ') AS published_at,
      |       'ch' || CAST(o_custkey % 7 AS VARCHAR) AS channel_id
      |FROM orders WHERE o_orderpriority = '2-HIGH'""".stripMargin) { (s, d) =>
    val dir = freshScratch("s11") + "/videos"
    Tables.orders(s, d)
      .where(col("o_orderpriority") === "2-HIGH")
      .select(
        concat(lit("v"), col("o_orderkey").cast("string")).as("video_id"),
        col("o_orderpriority").as("video_title"),
        date_format(timestamp_seconds(lit(1577836800L) + col("o_orderkey")),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("published_at"),
        concat(lit("ch"), (col("o_custkey") % 7).cast("string")).as("channel_id"),
        col("o_orderkey").as("ingest_seq"))
      .repartition(3) // several tasks => several staged temps => real job commit
      .write.format("graft-videos").option("path", dir).mode("append").save()
    s.read.format("graft-videos").option("path", dir).load()
      .select("video_id", "video_title", "published_at", "channel_id")
  }

  /** C27 — CHECK-constraint violation report, the gate under
    * [[graft.sinks.Constraints.drainChecked]] (refusal semantics pinned
    * in ConstraintsSpec; here the REPORT itself is hash-checked): a
    * staging batch with two kinds of injected corruption — an unknown
    * segment and nulled names — is audited against three declared
    * constraints in ONE aggregate pass. SQL CHECK semantics: a row
    * violates iff the predicate is FALSE (UNKNOWN passes), identical
    * `coalesce(NOT pred, false)` form on both engines.
    *
    * Scale: k conditional sums fold into a single 1-row aggregate —
    * the audit costs one scan of the staging delta, never touches the
    * warehouse, and the report is O(k). */
  val c27DrainConstraints = q("c27_drain_constraints",
    """WITH staged AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_nationkey = 5 THEN NULL ELSE c_name END AS c_name,
      |         CASE WHEN c_nationkey < 3 THEN 'INVALID' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer)
      |SELECT v.constraint_name, v.n_violations FROM (
      |  SELECT 'custkey_nonneg' AS constraint_name,
      |         CAST(sum(CASE WHEN coalesce(NOT (c_custkey >= 0), false) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM staged
      |  UNION ALL
      |  SELECT 'name_nonnull',
      |         CAST(sum(CASE WHEN coalesce(NOT (c_name IS NOT NULL), false) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM staged
      |  UNION ALL
      |  SELECT 'segment_known',
      |         CAST(sum(CASE WHEN coalesce(NOT (c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')), false) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM staged) v""".stripMargin) { (s, d) =>
    val staged = Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_nationkey") === 5, lit(null: String)).otherwise(col("c_name"))
        .as("c_name"),
      when(col("c_nationkey") < 3, lit("INVALID")).otherwise(col("c_mktsegment"))
        .as("c_mktsegment"))
    graft.sinks.Constraints.violationReport(staged, Seq(
      "custkey_nonneg" -> "c_custkey >= 0",
      "name_nonnull" -> "c_name IS NOT NULL",
      "segment_known" ->
        "c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')"))
  }

  val all: Seq[Q] = Seq(c20StreamDedupWatermark, c21AtomicCompaction,
    c22StreamLeftOuterJoin, c23EpochRangeSkipping, c24EpochSchemaEvolution,
    c25StreamSessionTimers, c26StreamRestartRecovery, s11Dsv2Write,
    c27DrainConstraints)
}
