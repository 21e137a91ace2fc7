package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 widening, part 59: the warehouse maintenance lifecycle's two
  * unexercised halves promoted into the hash-checked battery — date-
  * window epoch skipping on the generalized per-column zone maps and the
  * retention vacuum — plus the Spark-4 `transformWithState` debounce
  * executed by the engine (previously ⚙ spec-only).
  */
object Extended59 {

  /** C31 — EPOCH SKIPPING on a DATE column: each epoch's manifest entry
    * now carries per-column stats, so a `published_at`-windowed warehouse
    * read — the reference's core access pattern (publishedAfter/Before,
    * ref: Python-pipeline/dataingestion1.py:71-80), applied at the
    * WAREHOUSE instead of the source — prunes whole epochs whose date
    * range is disjoint ([[graft.sinks.AtomicWarehouse.readRangeOn]]).
    * The date is a pure function of the merge key (a video's publish
    * time never changes across refetches), satisfying readRangeOn's
    * version-stability contract; the June epoch is key- AND date-
    * disjoint from the queried May window, so it is never opened
    * (AtomicWarehouseSpec pins the pruned scan list for this shape).
    * The oracle replays all three epochs unpruned and filters — results
    * must match bit-for-bit.
    *
    * Scale: with time-windowed drains (the reference's 2/day cadence)
    * this makes a date-range read touch O(window) epochs instead of
    * re-merging the whole warehouse — the access pattern a 100 TB
    * incremental corpus store serves most. */
  val c31EpochDateSkipping = q("c31_epoch_date_skipping",
    """WITH base AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
      |         CASE WHEN c_custkey % 4 = 3
      |              THEN '2024-06-' ELSE '2024-05-' END ||
      |           lpad(CAST(1 + c_custkey % 28 AS VARCHAR), 2, '0') ||
      |           'T00:00:00Z' AS pub
      |  FROM customer),
      |e1 AS (
      |  SELECT k AS c_custkey, c_name, pub, 'BASE' AS seg,
      |         CAST(1 AS BIGINT) AS load_seq
      |  FROM base WHERE k % 4 <> 3),
      |e2 AS (
      |  SELECT k AS c_custkey, c_name, pub, 'REFETCHED' AS seg,
      |         CAST(2 AS BIGINT) AS load_seq
      |  FROM base WHERE k % 4 <> 3 AND k % 28 < 7),
      |e3 AS (
      |  SELECT k AS c_custkey, c_name, pub, 'JUNE' AS seg,
      |         CAST(3 AS BIGINT) AS load_seq
      |  FROM base WHERE k % 4 = 3),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
      |SELECT c_custkey, c_name, pub, seg, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1
      |  AND pub BETWEEN '2024-05-01' AND '2024-05-31T23:59:59Z'""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c31") + "/wh"
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
      concat(
        when(col("c_custkey") % 4 === 3, lit("2024-06-")).otherwise(lit("2024-05-")),
        lpad((lit(1) + col("c_custkey") % 28).cast("string"), 2, "0"),
        lit("T00:00:00Z")).as("pub"))
    def ep(seq: Long, dfv: org.apache.spark.sql.DataFrame, seg: String): Unit =
      AtomicWarehouse.commitEpoch(s, wh,
        dfv.withColumn("seg", lit(seg)).withColumn("load_seq", lit(seq)),
        seq, statsKey = Some("c_custkey"), statsCols = Seq("pub"))
    ep(1L, base.where(col("c_custkey") % 4 =!= 3), "BASE")
    ep(2L, base.where(col("c_custkey") % 4 =!= 3 && col("c_custkey") % 28 < 7),
      "REFETCHED")
    ep(3L, base.where(col("c_custkey") % 4 === 3), "JUNE")
    AtomicWarehouse.readRangeOn(s, wh, "c_custkey", "pub",
      "2024-05-01", "2024-05-31T23:59:59Z")
      .select("c_custkey", "c_name", "pub", "seg", "load_seq")
  }

  /** C32 — the `transformWithState` debounce executed by the STREAMING
    * ENGINE on the RocksDB state store
    * ([[graft.streaming.EventStream.debounceTws]]): Spark 4's arbitrary-
    * state API (the successor to flatMapGroupsWithState, with engine-
    * managed TTL eviction) processes the events replay in 4 micro-
    * batches; per-key state is a single TTL-backed ValueState[Long].
    * The oracle is c4's identical lag-window SQL — the same semantics on
    * the modern state API, previously pinned only in EventStreamSpec.
    *
    * Driving discipline: the engine keeps scheduling no-data batches to
    * advance the TTL clock (ProcessingTime mode), so
    * `processAllAvailable()` never returns — the replay instead polls
    * `lastProgress` until the source's committed endOffset reaches each
    * chunk's addData offset (deterministic: completion is offset
    * equality, not output guessing). Output is batch-boundary-invariant
    * by construction (within-batch rows sort by (ts, event_id) and state
    * carries the last-seen ts across batches), so coalesced micro-
    * batches can't change the hash.
    *
    * Scale: state is one long per ACTIVE (user, type) key — the TTL
    * eviction bounds the store by active keys, not ever-seen keys, which
    * is the property this API adds over c4's NoTimeout form (eviction is
    * output-invariant because the state TTL covers the debounce window;
    * see debounceTws's correctness note). */
  val c32StreamTwsDebounce = q("c32_stream_tws_debounce",
    """WITH x AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS us,
      |         lag(epoch_us(ts::TIMESTAMP)) OVER (
      |           PARTITION BY user_id, event_type
      |           ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev_us
      |  FROM events)
      |SELECT event_id, user_id, event_type
      |FROM x WHERE prev_us IS NULL OR us - prev_us >= 600000000""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.streaming.EventStream
    import graft.streaming.EventStream.DebEvent
    val rows = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[DebEvent]
      .collect()
      .sortBy(e => (e.tsMicros, e.event_id))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DebEvent]
    val sinkName = memorySinkName(s, "c32_tws_")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val provOld = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withShufflePartitions(s, 4) {
      val query = EventStream.debounceTws(source.toDS())
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .start()
      def awaitOffset(off: org.apache.spark.sql.connector.read.streaming.Offset): Unit = {
        val deadline = System.nanoTime() + 120L * 1000000000L
        def done = Option(query.lastProgress)
          .exists(p => p.sources.headOption.exists(_.endOffset == off.json))
        while (!done && System.nanoTime() < deadline) Thread.sleep(100)
        if (!done) throw new IllegalStateException(
          s"tws replay stalled before offset ${off.json}")
      }
      try {
        val nBatches = 3 // open/cross/flush state transitions; extra batches are pure trigger wall-clock
        val per = (rows.length + nBatches - 1) / nBatches
        rows.grouped(per).foreach { chunk =>
          awaitOffset(source.addData(chunk.toIndexedSeq))
        }
      } finally query.stop()
    } finally provOld match {
      case Some(v) => s.conf.set(provKey, v)
      case None => s.conf.unset(provKey)
    }
    s.table(sinkName).select("event_id", "user_id", "event_type")
  }

  /** C33 — the RETENTION VACUUM's full lifecycle in one hash-checked
    * entry: drain → drain → compact → drain → vacuum(retain 2), then the
    * snapshot read. Vacuum destroys exactly the unreferenced history
    * (manifests v1–v2 and the two pre-compaction epoch dirs) and must
    * change NOTHING observable in the current snapshot — the hashed
    * result carries the (deterministic) deletion counts as columns so
    * the contract "2 manifests + 2 dirs, snapshot intact" is itself
    * oracle-checked, not just spec-asserted. graceMs=0 is sound here by
    * vacuum's documented contract (single-process battery, no drain in
    * flight); the exclusive lock and lease behavior are pinned in
    * AtomicWarehouseSpec.
    *
    * Scale: vacuum I/O is O(dirs deleted) + one manifest listing; it
    * never reads data. Retention is the knob that trades time-travel
    * depth for storage — exactly BigQuery's time-travel window in the
    * reference's warehouse (ingestdatainbigquery.py loads rely on it
    * implicitly). */
  val c33VacuumRetention = q("c33_vacuum_retention",
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
      |         'POST' AS c_mktsegment, CAST(4 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey >= 20),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
      |SELECT c_custkey, c_name, c_mktsegment, load_seq,
      |       CAST(2 AS BIGINT) AS dropped_manifests,
      |       CAST(2 AS BIGINT) AS dropped_dirs
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c33") + "/wh"
    val cust = Tables.customer(s, d)
    def ep(seq: Long, dfv: org.apache.spark.sql.DataFrame): Unit =
      AtomicWarehouse.commitEpoch(s, wh,
        dfv.select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_mktsegment"), lit(seq).as("load_seq")), seq)
    ep(1L, cust)                                       // manifest v1
    ep(2L, cust.where(col("c_nationkey") < 10)         // manifest v2
      .withColumn("c_mktsegment", lit("REFETCHED")))
    AtomicWarehouse.compact(s, wh, "c_custkey")        // v3 = [compact_v2]
    ep(4L, cust.where(col("c_nationkey") >= 20)        // v4 = [compact_v2, epoch_4]
      .withColumn("c_mktsegment", lit("POST")))
    val (m, dd) = AtomicWarehouse.vacuum(s, wh, retainVersions = 2,
      graceMs = 0L)
    AtomicWarehouse.read(s, wh, "c_custkey")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("load_seq"),
        lit(m.toLong).as("dropped_manifests"),
        lit(dd.toLong).as("dropped_dirs"))
  }

  val all: Seq[Q] = Seq(c31EpochDateSkipping, c32StreamTwsDebounce,
    c33VacuumRetention)
}
