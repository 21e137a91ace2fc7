package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 widening, part 56: DSIR importance weighting and the
  * exactly-once streaming sink. */
object Extended56 {

  private val tgtSrcs = Seq("src0", "src1")
  private def tgtSql = tgtSrcs.map("'" + _ + "'").mkString("(", ",", ")")

  /** T37 — DSIR data selection (hashed-n-gram importance resampling, Xie
    * et al. '23): score every raw document by the log importance ratio
    * ln p_target / p_raw under add-1-smoothed hashed-BIGRAM unigram
    * models — target = the curated domain (src0/src1 here), raw = the
    * rest — then flag positive-ratio docs (the target-like slice of the
    * raw pool). Features are md5-bucketed into a FIXED 512-bucket space:
    * the hashing trick bounds both model tables at 512 rows regardless
    * of corpus size, so — unlike t12's corpus-growing vocabulary, where
    * a broadcast is a scale-killer — broadcasting these is exactly
    * right, and the scoring join is map-side everywhere.
    *
    * Shape at scale: one bigram explode (shared by both models and the
    * scoring pass), two 512-row aggregates, one broadcast join, one
    * per-doc shuffle. The smoothed ratio is a single ln per feature so
    * the 4-decimal rounding contract holds cross-engine (t12
    * precedent). */
  val t37Dsir = q("t37_dsir_importance",
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, source,
       |         ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 3))::BIGINT % 512 AS h
       |  FROM tok CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) u(i)
       |  WHERE len(t) >= 2),
       |tgt AS (SELECT h, count(*) AS n FROM bg WHERE source IN $tgtSql GROUP BY 1),
       |rawc AS (SELECT h, count(*) AS n FROM bg WHERE source NOT IN $tgtSql GROUP BY 1),
       |tots AS (
       |  SELECT CAST(sum(CASE WHEN source IN $tgtSql THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |         CAST(sum(CASE WHEN source NOT IN $tgtSql THEN 1 ELSE 0 END) AS BIGINT) AS nr
       |  FROM bg),
       |scored AS (
       |  SELECT b.doc_id,
       |         ln((coalesce(t.n, 0) + 1.0) * (tots.nr + 512.0)
       |            / ((coalesce(r.n, 0) + 1.0) * (tots.nt + 512.0))) AS lr
       |  FROM bg b
       |  LEFT JOIN tgt t ON b.h = t.h
       |  LEFT JOIN rawc r ON b.h = r.h
       |  CROSS JOIN tots
       |  WHERE b.source NOT IN $tgtSql)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
       |       ${rnd("avg(lr)", 4)} AS dsir_score,
       |       ${rnd("avg(lr)", 4)} > 0 AS selected
       |FROM scored GROUP BY 1""".stripMargin) { (s, d) =>
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat(element_at(col("t"), i), lit(" "),
            element_at(col("t"), i + 1)))).as("bg"))
      .select(col("doc_id"), col("source"),
        (graft.functions.HexPrefixLong(md5(col("bg")), 3) % 512).as("h"))
    val isTgt = col("source").isin(tgtSrcs: _*)
    val tgt = bg.where(isTgt).groupBy("h").agg(count(lit(1)).as("nt_h"))
    val rawc = bg.where(!isTgt).groupBy("h").agg(count(lit(1)).as("nr_h"))
    val tots = bg.agg(
      sum(when(isTgt, 1L).otherwise(0L)).as("nt"),
      sum(when(!isTgt, 1L).otherwise(0L)).as("nr"))
    val lr = log((coalesce(col("nt_h"), lit(0L)) + lit(1.0)) * (col("nr") + lit(512.0)) /
      ((coalesce(col("nr_h"), lit(0L)) + lit(1.0)) * (col("nt") + lit(512.0))))
    // 512-row model tables: hashing-trick-bounded, hence broadcastable at
    // ANY corpus size (the inverse of t12's corpus-growing vocabulary)
    bg.where(!isTgt)
      .join(broadcast(tgt), Seq("h"), "left")
      .join(broadcast(rawc), Seq("h"), "left")
      .crossJoin(broadcast(tots))
      .select(col("doc_id"), lr.as("lr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        round(avg(col("lr")), 4).as("dsir_score"),
        (round(avg(col("lr")), 4) > 0).as("selected"))
  }

  /** C19 — EXACTLY-ONCE streaming sink: events replay through a
    * MemoryStream in 4 micro-batches; foreachBatch commits each batch to
    * an [[graft.sinks.AtomicWarehouse]] with load_seq = batchId — and the
    * replay then RE-COMMITS one batch with the same id, simulating the
    * failure-retry Spark gives foreachBatch (a batch can run twice with
    * the same batchId; the sink must make that a no-op). Committed epochs
    * are immutable and re-commits of a committed id no-op, so the
    * warehouse holds every event exactly once; the oracle reconstructs
    * the batch assignment arithmetically (row_number over event time ÷
    * batch size), so the hash pins batching, idempotence, and content.
    *
    * Scale: this is THE production pattern for streaming into a
    * warehouse — idempotent batchId-keyed commits turn at-least-once
    * delivery into exactly-once without any dedup scan of the
    * destination. */
  val c19ExactlyOnceSink = q("c19_exactly_once_sink",
    """WITH ordered AS (
      |  SELECT event_id, user_id, event_type,
      |         row_number() OVER (ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS rn,
      |         count(*) OVER () AS n
      |  FROM events)
      |SELECT event_id, user_id, event_type,
      |       CAST(floor((rn - 1) / ceil(n / 4.0)) AS BIGINT) AS load_seq
      |FROM ordered""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.sinks.AtomicWarehouse
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = freshScratch("c19")
    val warehouse = s"$base/warehouse"
    val rows = Tables.events(s, d)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect()
      .sortBy(r => (r._1, r._2))
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val per = (rows.length + 3) / 4
    withShufflePartitions(s, 2) {
      val query = source.toDF().toDF("us", "event_id", "user_id", "event_type")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          AtomicWarehouse.commitEpoch(s, warehouse,
            batch.select("event_id", "user_id", "event_type")
              .withColumn("load_seq", lit(id)), id)
        }
        .start()
      try {
        rows.grouped(per).foreach { chunk =>
          source.addData(chunk.toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
    }
    // the injected retry: re-commit batch 1's exact content under its
    // batchId, as a post-failure re-run would — must be a no-op
    rows.grouped(per).toSeq.lift(1).foreach { chunk =>
      AtomicWarehouse.commitEpoch(s, warehouse,
        chunk.toSeq.toDF("us", "event_id", "user_id", "event_type")
          .select("event_id", "user_id", "event_type")
          .withColumn("load_seq", lit(1L)), 1L)
    }
    AtomicWarehouse.read(s, warehouse, "event_id")
      .select("event_id", "user_id", "event_type", "load_seq")
  }

  val all: Seq[Q] = Seq(t37Dsir, c19ExactlyOnceSink)
}
