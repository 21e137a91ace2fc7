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
    val nBatches = 4
    val batches = Array.fill(nBatches)(Vector.newBuilder[DebEvent])
    rows.groupBy(_.user_id).valuesIterator.foreach { evs =>
      evs.sortBy(e => (e.tsMicros, e.event_id)).zipWithIndex.foreach {
        case (e, i) => batches(math.min(i, nBatches - 1)) += e
      }
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DebEvent]
    val sinkName = "c20_dedup_" + math.abs(java.util.UUID.randomUUID().hashCode())
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

  val all: Seq[Q] = Seq(c20StreamDedupWatermark)
}
