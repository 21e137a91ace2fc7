package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 34: the remaining streaming-engine shapes
  * promoted into the hash-checked battery (c4 covered keyed state via
  * flatMapGroupsWithState): the stream-stream interval join and the
  * watermarked event-time window aggregate, both executed by the real
  * engine over MemoryStream micro-batches and hashed against batch SQL.
  */
object Extended34 {

  /** Replay `events` rows through a MemoryStream in `nBatches` event-time
    * ordered micro-batches (so watermarks advance between batches exactly
    * as they would on a live source) and return the memory sink's
    * contents. The driver-side collect exists only because MemoryStream
    * is by construction a driver-side test source — the production path
    * is readStream on files/kafka with the identical downstream plan. */
  private[queries] def replayStream(s: SparkSession, d: String, nBatches: Int,
      feedTypes: Seq[String] = Nil, shufflePartitions: Int = 4,
      noDataBatches: Boolean = true)(
      build: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // feedTypes narrows the REPLAY to the event types the streaming plan
    // consumes (its own filters discard the rest row-by-row anyway) —
    // semantics identical, but the collect, the per-batch scan, and the
    // watermark bookkeeping all shrink to the relevant sub-stream
    val base = Tables.events(s, d)
    val fed = if (feedTypes.isEmpty) base
      else base.where(col("event_type").isin(feedTypes: _*))
    val rows = fed
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String, Double)]
    val events = build(source.toDF()
      .toDF("us", "event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))))
    val sinkName = memorySinkName(s, "c_stream_")
    // noDataBatches=false halves the micro-batch count for queries whose
    // OUTPUT doesn't depend on watermark-triggered emission (stream-stream
    // inner joins emit on arrival; the watermark only bounds state, and a
    // later watermark advance only retains MORE state — results
    // identical). Queries that flush on watermark (append-mode window
    // aggs) must keep the no-data batches.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndOld = s.conf.getOption(ndKey)
    s.conf.set(ndKey, noDataBatches.toString)
    try withShufflePartitions(s, shufflePartitions) {
      val query = events.writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        val per = (rows.length + nBatches - 1) / nBatches
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
    } finally ndOld match {
      case Some(v) => s.conf.set(ndKey, v)
      case None => s.conf.unset(ndKey)
    }
    s.table(sinkName)
  }

  /** C5 — stream-stream interval join executed by the streaming engine:
    * errors matched to same-user clicks in the trailing 10 minutes
    * ([[graft.streaming.EventStream.clickErrorJoin]]), both sides
    * watermarked so join state is bounded — Spark retains each side only
    * until the other's watermark clears the interval. The feed is
    * event-time ordered, so no qualifying pair is ever late and the
    * engine's incremental result must equal the batch interval join the
    * oracle states (e7's shape). What is verified: watermark-driven state
    * retention ACROSS 3 micro-batches never evicts a row that a future
    * batch still needs. */
  val c5StreamIntervalJoin = q("c5_stream_interval_join",
    """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
      |FROM events e JOIN events c
      |  ON c.user_id = e.user_id
      | AND c.event_type = 'click' AND e.event_type = 'error'
      | AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts""".stripMargin) { (s, d) =>
    replayStream(s, d, nBatches = 3, feedTypes = Seq("click", "error"),
      shufflePartitions = 2, noDataBatches = false) { ev =>
      graft.streaming.EventStream.clickErrorJoin(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "error"))
    }.select("error_id", "click_id", "user_id")
  }

  /** C6 — watermarked tumbling-window aggregate executed by the streaming
    * engine ([[graft.streaming.EventStream.windowedAgg]], 1h windows,
    * 4-day watermark): append mode only emits a window once the watermark
    * passes its end, so the replay appends one far-future flush sentinel
    * (filtered back out of the result) to close the final windows — the
    * standard end-of-stream drain. Hash-equality with the batch GROUP BY
    * proves the incremental per-window partial aggregation + late-row
    * admission logic reproduces the declarative semantics exactly. */
  val c6StreamWindowAgg = q("c6_stream_window_agg",
    s"""SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
       |       event_type, CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("sum(value)", 2)} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Tables.events(s, d)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
    val maxUs = rows.last._1
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Double)]
    val events = graft.streaming.EventStream.windowedAgg(
      source.toDF().toDF("us", "event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("us"))))
    val sinkName = memorySinkName(s, "c6_sink_")
    withShufflePartitions(s, 4) {
      val query = events.writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        val per = (rows.length + 2) / 3 // 3 data batches: open/cross/flush state transitions
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
        // end-of-stream drain: a sentinel 10 days past the data pushes the
        // watermark beyond every real window so append mode flushes them
        source.addData((maxUs + 10L * 86400 * 1000000, -1L, "__flush", 0.0))
        query.processAllAvailable()
      } finally query.stop()
    }
    s.table(sinkName)
      .where(col("event_type") =!= "__flush")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), round(col("total_value"), 2).as("total_value"))
  }

  /** J12 — bloom-filter runtime pre-join pruning: the manual form of
    * Spark's InjectRuntimeFilter, for when the build side comes from a
    * separate job (or the optimizer's thresholds don't fire). A bloom
    * filter over the qualifying orderkeys (high-value urgent orders,
    * ~2% of orders) is built in one aggregate pass, serialized (~KBs),
    * and probed scan-side on lineitem through the codegen
    * [[graft.functions.BloomMightContain]] expression — so ~98% of fact
    * rows die BEFORE the join exchange instead of after it. No false
    * negatives + the exact join removing false positives ⇒ the result is
    * bit-identical to the plain join, which is exactly what the oracle
    * states (the bloom is invisible in the semantics, only in the plan —
    * PlanAuditSpec pins the probe below the exchange).
    *
    * At 100 TB this is the difference between shuffling the full fact
    * table and shuffling the ~2% that can match: the filter rides the
    * broadcast path (one object per executor), the probe is one hash on
    * a long inside whole-stage codegen. */
  val j12BloomPrejoin = q("j12_bloom_prejoin",
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o.o_totalprice > 250000
      |GROUP BY 1""".stripMargin) { (s, d) =>
    import graft.functions.BloomMightContain
    val dim = Tables.orders(s, d)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice") > 250000)
      .select("o_orderkey", "o_orderpriority")
    val nKeys = math.max(1000L, dim.count())
    val bloomBytes = BloomMightContain.serialize(
      dim.stat.bloomFilter("o_orderkey", nKeys, 0.01))
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity")
      .where(BloomMightContain(col("l_orderkey"), bloomBytes))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("total_qty"))
  }

  val all: Seq[Q] = Seq(c5StreamIntervalJoin, c6StreamWindowAgg, j12BloomPrejoin)
}
