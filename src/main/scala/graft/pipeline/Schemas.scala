package graft.pipeline

import org.apache.spark.sql.types._

/** Fixed schemas for the pipeline's tables (SURVEY.md §1.2–1.3).
  *
  * The reference addresses staging columns positionally (A–AD in the
  * sheet); here every column is NAMED and this StructType constant pins
  * the canonical order so goldens stay comparable
  * (ref: Python-pipeline/dataingestion1.py:142, dataprocessing3.py:99-102).
  */
object Schemas {

  /** Raw flattened search result (ref dataingestion1.py:83-92) plus the
    * explicit arrival order that replaces pandas' implicit row order. */
  val videoRaw: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("video_title", StringType),
    StructField("published_at", StringType), // ISO-8601 ...Z (UTC)
    StructField("channel_id", StringType),
    StructField("ingest_seq", LongType)))

  val channels: StructType = StructType(Seq(
    StructField("channel_id", StringType),
    StructField("channel_name", StringType)))

  val employees: StructType = StructType(Seq(
    StructField("team", StringType),
    StructField("employee_code", StringType)))

  val shows: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("show_name", StringType),
    StructField("broadcaster", StringType),
    StructField("category", StringType)))

  val cpmCategories: StructType = StructType(Seq(
    StructField("shows_name", StringType),
    StructField("cpm_category", StringType)))

  /** Analytics facts — the local stand-in for the Analytics API; the
    * AnalyticsSource aggregates it the way the API does
    * (ref dataprocessing.py:85-94). */
  val analyticsFacts: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("content_owner_id", StringType),
    StructField("content_type", StringType),
    StructField("views", LongType),
    StructField("minutes_watched", DoubleType),
    StructField("avg_view_duration_s", LongType),
    StructField("comments", LongType),
    StructField("likes", LongType),
    StructField("shares", LongType),
    StructField("revenue", DoubleType),
    StructField("cpm", DoubleType),
    StructField("subs_gained", LongType),
    StructField("subs_lost", LongType)))

  /** The staging table, columns A–AD in reference order (§1.2). Metric
    * columns use real types in-core; the all-string edge form is applied
    * only at the warehouse boundary (F20). `ingest_seq` is the explicit
    * dedup-ordering key (appended, not part of A–AD). */
  val staging: StructType = StructType(Seq(
    StructField("video_id", StringType),             // A
    StructField("video_title", StringType),          // B
    StructField("channel_name", StringType),         // C
    StructField("published_at", StringType),         // D (ISO ...Z)
    StructField("main_code", StringType),            // E
    StructField("len", IntegerType),                 // F
    StructField("code", StringType),                 // G
    StructField("resource_code", StringType),        // H
    StructField("resource_name", StringType),        // I
    StructField("show_name", StringType),            // J
    StructField("broadcaster", StringType),          // K
    StructField("category", StringType),             // L
    StructField("published_date_local", StringType), // M (Asia/Karachi)
    StructField("published_time_local", StringType), // N
    StructField("content_type", StringType),         // O
    StructField("views", LongType),                  // P
    StructField("watch_time_hours", DoubleType),     // Q
    StructField("avg_view_duration", StringType),    // R (H:MM:SS)
    StructField("comments", LongType),               // S
    StructField("likes", LongType),                  // T
    StructField("shares", LongType),                 // U
    StructField("estimated_revenue", DoubleType),    // V
    StructField("cpm", DoubleType),                  // W
    StructField("subscribers_gained", LongType),     // X
    StructField("subscribers_lost", LongType),       // Y
    StructField("net_subscribers", LongType),        // Z
    StructField("engagement_rate", DoubleType),      // AA
    StructField("cpv", DoubleType),                  // AB
    StructField("rpm", DoubleType),                  // AC
    StructField("cpm_category", StringType),         // AD
    StructField("ingest_seq", LongType)))            // dedup order key

  val stagingColumns: Seq[String] = staging.fields.map(_.name).toSeq
}
