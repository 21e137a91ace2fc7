package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local stand-in for the YouTube Analytics API — the remote endpoint IS
  * a grouped aggregate (group by video [+creatorContentType], 10 metrics,
  * filter to an id batch, sort -views, limit 500)
  * (ref: Python-pipeline/dataprocessing.py:76-103, dataprocessing2.py:76-103).
  *
  * Production would wrap the HTTP API in a DataSource V2 TableProvider
  * with SupportsPushDownFilters/RequiredColumns/TopN (each ≤500-id batch
  * = one InputPartition); this local implementation computes the same
  * aggregate over an `analytics_facts` table so the pipeline is testable
  * hermetically. The id filter is a semi join (not isin) so a 100 TB fact
  * table still prunes by broadcast.
  */
object AnalyticsSource {

  /** Metrics for `ids` visible to one content owner. `withContentType`
    * mirrors dataprocessing2's extra dimension (:90). */
  def metricsFor(facts: DataFrame, ids: DataFrame, ownerId: String,
      withContentType: Boolean): DataFrame = {
    val owned = facts.where(col("content_owner_id") === ownerId)
      .join(broadcast(ids.select(col("video_id"))), Seq("video_id"), "left_semi")
    val keys = if (withContentType) Seq(col("video_id"), col("content_type"))
      else Seq(col("video_id"))
    owned.groupBy(keys: _*).agg(
      sum("views").as("views"),
      sum("minutes_watched").as("minutes_watched"),
      avg("avg_view_duration_s").cast("long").as("avg_view_duration_s"),
      sum("comments").as("comments"),
      sum("likes").as("likes"),
      sum("shares").as("shares"),
      sum("revenue").as("revenue"),
      avg("cpm").as("cpm"),
      sum("subs_gained").as("subs_gained"),
      sum("subs_lost").as("subs_lost"))
  }

  /** The 3-content-owner loop with anti-join "remaining" semantics
    * (ref dataprocessing.py:106-114): each owner only fetches ids not
    * already satisfied by a previous owner. */
  def metricsAcrossOwners(facts: DataFrame, ids: DataFrame,
      owners: Seq[String], withContentType: Boolean): DataFrame = {
    val (all, _) = owners.foldLeft((Option.empty[DataFrame], ids)) {
      case ((acc, remaining), owner) =>
        val got = metricsFor(facts, remaining, owner, withContentType)
        val newAcc = acc.map(_.unionByName(got)).orElse(Some(got))
        val stillMissing = remaining.join(
          got.select("video_id"), Seq("video_id"), "left_anti")
        (newAcc, stillMissing)
    }
    all.getOrElse(facts.sparkSession.emptyDataFrame)
  }
}
