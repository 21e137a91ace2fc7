package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 35: streaming sessionization executed by the
  * engine (the last big EventStream shape missing from the battery), and
  * the partitioned-warehouse write→pruned-read path as an oracle-checked
  * query.
  */
object Extended35 {

  /** C7 — gap-sessionization executed by the STREAMING ENGINE
    * ([[graft.streaming.EventStream.sessionize]], flatMapGroupsWithState
    * keeping the open session per user in state): events replay in 5
    * event-time-ordered micro-batches, a session row is emitted whenever
    * a 30-minute gap closes it, and per-user end-of-stream sentinels
    * (one event far past the data, never emitted themselves — their
    * 1-event sessions stay open in state) flush the trailing sessions.
    * The oracle is e2's declarative lag/cumsum sessionization re-keyed to
    * (user, n_events, last_us) — the engine's cross-batch state handoff
    * must reconstruct exactly the batch session boundaries.
    *
    * Scale: state per user is the open session's event list — bounded by
    * session length, not history; the production source is readStream,
    * the MemoryStream replay exists because that is the only driver-side
    * test source. */
  val c7StreamSessionize = q("c7_stream_sessionize",
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
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[EventStream.SessionEvent]
      .collect()
      .sortBy(e => (e.tsMicros, e.event_id))
    val users = rows.map(_.user_id).distinct
    val flushUs = rows.last.tsMicros + 86400L * 1000000
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.SessionEvent]
    val sinkName = memorySinkName(s, "c7_sink_")
    withShufflePartitions(s, 4) {
      val query = EventStream.sessionize(source.toDS())
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        val per = (rows.length + 2) / 3 // 3 data batches: open/cross/flush state transitions
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
        // end-of-stream flush: one sentinel per user closes every open
        // session; the sentinels' own 1-event sessions stay in state unseen
        source.addData(users.map(u =>
          EventStream.SessionEvent(u, -1L, flushUs)).toIndexedSeq)
        query.processAllAvailable()
      } finally query.stop()
    }
    s.table(sinkName)
      .select(col("user_id"), col("session_events").as("n_events"),
        col("last_micros").as("last_us"))
  }

  /** C8 — partitioned warehouse write → partition-pruned read: events
    * land in a hive-layout warehouse partitioned by event_type
    * ([[graft.sinks.Warehouse.appendPartitioned]]), and the reading query
    * filters on the partition column — so Spark prunes whole directories
    * at PLANNING time (PartitionFilters on the scan; PlanAuditSpec pins
    * it) and the daily rollup only ever opens the one matching partition.
    * The oracle states the same rollup over the raw table: the partition
    * layout must be semantically invisible while the scan reads ~1/5 of
    * the files. At 100 TB this is the core warehouse read pattern —
    * partition on the dominant filter column, prune before I/O. */
  val c8PartitionPrune = q("c8_partition_prune",
    """SELECT CAST(ts::TIMESTAMP AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val wh = freshScratch("c8_wh")
    graft.sinks.Warehouse.appendPartitioned(
      Tables.events(s, d).select("event_id", "user_id", "ts", "event_type"),
      wh, Seq("event_type"))
    s.read.parquet(wh)
      .where(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"))
  }

  val all: Seq[Q] = Seq(c7StreamSessionize, c8PartitionPrune)
}
