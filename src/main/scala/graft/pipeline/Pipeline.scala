package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Warehouse
import graft.sources.{AnalyticsSource, DimLoader}

/** End-to-end epoch runner — the reference's Airflow DAG
  * (ref: dags/Dashboard-pipeline.py) collapses into one composed Catalyst
  * plan per epoch: sources → 6 transform stages → staging overwrite →
  * warehouse drain. Scheduling (2×/day cron) stays external, exactly like
  * the reference; `runDate`/window bounds are injected for determinism.
  */
object Pipeline {

  final case class Sources(
      videos: DataFrame,       // Schemas.videoRaw
      channels: DataFrame,     // channel dim (already last-wins deduped)
      employees: DataFrame,
      shows: DataFrame,
      cpmCategories: DataFrame,
      analyticsFacts: DataFrame,
      contentOwners: Seq[String])

  final case class Dirs(stagingDir: String, warehouseDir: String)

  def loadDims(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = (
    DimLoader.loadDim(spark, s"$dir/channels.json", Schemas.channels, "channel_id"),
    DimLoader.loadDim(spark, s"$dir/employees.json", Schemas.employees, "employee_code"),
    DimLoader.loadDim(spark, s"$dir/shows.json", Schemas.shows, "code"),
    DimLoader.loadDim(spark, s"$dir/cpm_categories.json", Schemas.cpmCategories, "shows_name"))

  def readStaging(spark: SparkSession, dirs: Dirs): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dirs.stagingDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema(Schemas.staging).parquet(dirs.stagingDir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.staging)
  }

  /** One epoch: stages 1–6 composed lazily into a single plan, written to
    * staging (the only materialization), then stage 7 drains staging to
    * the warehouse with idempotent dedup.
    */
  def runEpoch(spark: SparkSession, src: Sources, dirs: Dirs,
      windowStartIso: String, windowEndIso: String, loadSeq: Long,
      drainToWarehouse: Boolean = true): DataFrame = {
    val prior = readStaging(spark, dirs)
    val s1 = Stages.ingest(src.videos, src.channels, prior,
      windowStartIso, windowEndIso)
    val s2 = Stages.enrichTitleCode(s1, src.employees)
    val s3 = Stages.enrichShow(s2, src.shows)
    val ids = s3.select("video_id")
    val metrics = AnalyticsSource.metricsAcrossOwners(
      src.analyticsFacts, ids, src.contentOwners, withContentType = true)
    val s5 = Stages.mergeAnalytics(s3, metrics)
    val s6 = Stages.toCanonical(Stages.derive(s5, src.cpmCategories))

    // staging overwrite (K1): write-then-swap via temp dir because the
    // plan reads the same staging dir it replaces.
    val tmp = dirs.stagingDir + "_epoch_tmp"
    s6.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dirs.stagingDir)

    if (drainToWarehouse)
      Warehouse.drain(spark, dirs.stagingDir, dirs.warehouseDir, "video_id", loadSeq)
    spark.read.parquet(if (drainToWarehouse) dirs.warehouseDir else dirs.stagingDir)
  }
}
