package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 49: dynamic partition overwrite and
  * corrupt-record-tolerant semi-structured ingestion.
  */
object Extended49 {

  /** C14 — dynamic partition overwrite (the INSERT OVERWRITE
    * PARTITION contract): land events partitioned by type, then
    * overwrite ONLY the 'click' partition with a corrected feed
    * (values doubled) under
    * spark.sql.sources.partitionOverwriteMode=dynamic — partitions the
    * second write doesn't touch must survive byte-for-byte. The oracle
    * states the post-state declaratively: click rows corrected,
    * everything else original. This is the idempotent-backfill primitive
    * (re-land one day/type without truncating the table).
    *
    * Shape at scale: the overwrite rewrites exactly the files of the
    * affected partition; planning-time pruning (c8) keeps the read side
    * partition-local. */
  val c14DynamicOverwrite = q("c14_dynamic_partition_overwrite",
    s"""SELECT event_type,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("sum(CASE WHEN event_type = 'click' THEN value * 2 ELSE value END)", 2)} AS total_value
       |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
    val wh = freshScratch("c14_wh")
    val ev = Tables.events(s, d)
      .select("event_id", "user_id", "value", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(wh)
    val old = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // corrected click feed: dynamic mode must replace ONLY this
      // partition's files and leave every other partition untouched
      ev.where(col("event_type") === "click")
        .withColumn("value", col("value") * 2)
        .write.partitionBy("event_type").mode("overwrite").parquet(wh)
    } finally old match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    s.read.parquet(wh).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"))
  }

  /** S10 — corrupt-record-tolerant JSON ingestion (PERMISSIVE mode with
    * columnNameOfCorruptRecord): a deterministic JSON-lines landing file
    * where every 7th record is truncated mid-object — the reader must
    * parse the good rows, capture bad lines in the corrupt-record
    * column, and never fail the job (the resilience contract of
    * schema-on-read ingestion; FAILFAST is one config flip away). The
    * oracle derives the same good/bad accounting closed-form from the
    * generation rule, so the parse behavior itself is what's checked.
    *
    * Shape at scale: the landing file is written scan-side from the
    * documents table (one file per partition in production); PERMISSIVE
    * parse is a per-row map — no shuffle until the audit agg. */
  val s10JsonCorrupt = q("s10_json_corrupt_source",
    """WITH g AS (
      |  SELECT doc_id, source, n_chars,
      |         doc_id % 7 = 0 AS corrupt
      |  FROM documents)
      |SELECT source,
      |       CAST(sum(CASE WHEN NOT corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
      |       CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |       CAST(sum(CASE WHEN NOT corrupt THEN n_chars ELSE 0 END) AS BIGINT) AS chars_good
      |FROM g GROUP BY 1""".stripMargin) { (s, d) =>
    val dir = freshScratch("s10")
    // deterministic JSON-lines landing: every 7th record truncated
    // mid-value — the prefix (doc_id, source) survives inside the raw
    // line, which is exactly what quarantine triage relies on
    Tables.documents(s, d)
      .select(when(col("doc_id") % 7 === 0,
          concat(lit("{\"doc_id\": "), col("doc_id").cast("string"),
            lit(", \"source\": \""), col("source"),
            lit("\", \"n_chars\": tru")))
        .otherwise(to_json(struct(col("doc_id"), col("source"), col("n_chars"))))
        .as("line"))
      .write.mode("overwrite").text(dir)
    s.read
      .schema("doc_id LONG, source STRING, n_chars LONG, _bad STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir)
      .select(
        coalesce(col("source"),
          regexp_extract(col("_bad"), "\"source\": \"([^\"]+)\"", 1)).as("source"),
        col("_bad"), col("n_chars"))
      .groupBy("source")
      .agg(sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        coalesce(sum(when(col("_bad").isNull, col("n_chars"))), lit(0L)).as("chars_good"))
  }

  val all: Seq[Q] = Seq(c14DynamicOverwrite, s10JsonCorrupt)
}
