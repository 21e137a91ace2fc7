package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 widening, part 58: the last two spec-only warehouse/streaming
  * shapes promoted to hash-checked battery entries — stream-static
  * broadcast enrichment executed by the streaming engine, and hive-layout
  * small-file compaction round-tripped through a partitioned warehouse.
  */
object Extended58 {

  /** C28 — stream-static BROADCAST enrichment on the STREAMING ENGINE
    * ([[graft.streaming.EventStream.enrichStream]]): events replay in 4
    * micro-batches and every batch left-joins a STATIC customer-segment
    * dimension under an explicit `broadcast()` hint, defaulting misses to
    * 'UNKNOWN' — the reference's per-row channel-name lookup
    * (dataingestion1.py:129-133) in its production streaming form. The
    * dim keeps only custkeys not divisible by 3, so both the hit and the
    * default path are exercised on every batch. Oracle: the identical
    * batch left join.
    *
    * This is the stateless streaming join: no watermark, no state store —
    * each micro-batch plans a broadcast-hash join against the static side
    * and emits on arrival. At scale the stream side never shuffles; the
    * dim re-broadcasts per planning cycle and its size, not the stream's,
    * bounds memory. */
  val c28StreamStaticEnrich = q("c28_stream_static_enrich",
    """SELECT e.event_id, e.user_id, e.event_type,
      |       coalesce(c.segment, 'UNKNOWN') AS segment
      |FROM events e
      |LEFT JOIN (SELECT CAST(c_custkey AS BIGINT) AS user_id,
      |                  c_mktsegment AS segment
      |           FROM customer WHERE c_custkey % 3 <> 0) c
      |  ON e.user_id = c.user_id""".stripMargin) { (s, d) =>
    val dim = Tables.customer(s, d)
      .where(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment").as("segment"))
    Extended34.replayStream(s, d, nBatches = 3, shufflePartitions = 2,
      noDataBatches = false) { ev =>
      graft.streaming.EventStream.enrichStream(ev, dim, "user_id",
        "segment", "UNKNOWN")
        .select("event_id", "user_id", "event_type", "segment")
    }
  }

  /** C29 — hive-layout SMALL-FILE COMPACTION round-trip
    * ([[graft.sinks.Warehouse.compact]]): three partitioned appends leave
    * every event_type directory holding multiple small files (the
    * accumulation every periodic-append warehouse suffers), compaction
    * rewrites each hive partition to few files behind an atomic-ish
    * rename swap, and the post-compaction rollup must be
    * indistinguishable from the raw table (the oracle never sees the
    * layout). The file-shrink itself is asserted driver-side: compaction
    * that doesn't reduce file count is a silent no-op bug.
    *
    * At 100 TB this is the maintenance pass that keeps scan planning
    * proportional to data size instead of append count — file listing,
    * footer reads, and task scheduling all degrade with file count, not
    * bytes. */
  val c29HiveCompaction = q("c29_hive_compaction",
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       |       ${rnd("sum(value)", 2)} AS total_value
       |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
    val wh = freshScratch("c29_wh")
    val ev = Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
    (0 until 3).foreach { r =>
      graft.sinks.Warehouse.appendPartitioned(
        ev.where(col("user_id") % 3 === r), wh, Seq("event_type"))
    }
    def parquetFiles(): Int = {
      val p = new org.apache.hadoop.fs.Path(wh)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = parquetFiles()
    graft.sinks.Warehouse.compact(s, wh, Seq("event_type"),
      targetRowsPerFile = 10000000L)
    val after = parquetFiles()
    require(after < before,
      s"compaction must shrink file count (before=$before after=$after)")
    s.read.parquet(wh)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"),
        round(sum("value"), 2).as("total_value"))
  }

  val all: Seq[Q] = Seq(c28StreamStaticEnrich, c29HiveCompaction)
}
