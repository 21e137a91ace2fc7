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

  /** Stages 1–6 composed lazily into ONE Catalyst plan, materialized
    * only at the staging overwrite (K1, write-then-swap because the plan
    * reads the same staging dir it replaces). Shared by every epoch
    * runner below. */
  private def stageEpoch(spark: SparkSession, src: Sources, dirs: Dirs,
      windowStartIso: String, windowEndIso: String): Unit = {
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

    val tmp = dirs.stagingDir + "_epoch_tmp"
    s6.write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap by FILESYSTEM RENAME (Warehouse.compact's pattern): the tmp dir
    // already holds exactly the new staging content, so re-writing it
    // through a second Spark job (the old read-back + overwrite) doubled
    // the staging I/O and added two jobs per epoch for identical bytes
    val dst = new org.apache.hadoop.fs.Path(dirs.stagingDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new java.io.IOException(
        s"staging swap failed: rename($tmp -> ${dirs.stagingDir})")
  }

  /** One epoch: stages 1–6 composed lazily into a single plan, written to
    * staging (the only materialization), then stage 7 drains staging to
    * the warehouse with idempotent dedup.
    */
  def runEpoch(spark: SparkSession, src: Sources, dirs: Dirs,
      windowStartIso: String, windowEndIso: String, loadSeq: Long,
      drainToWarehouse: Boolean = true): DataFrame = {
    stageEpoch(spark, src, dirs, windowStartIso, windowEndIso)
    if (drainToWarehouse)
      Warehouse.drain(spark, dirs.stagingDir, dirs.warehouseDir, "video_id", loadSeq)
    spark.read.parquet(if (drainToWarehouse) dirs.warehouseDir else dirs.stagingDir)
  }

  /** The PRODUCTION-SHAPED epoch: stages 1–6 as one plan, then a
    * CHECK-gated, atomically-committed drain into the
    * [[graft.sinks.AtomicWarehouse]] ([[graft.sinks.Constraints
    * .drainChecked]]: the audit and the commit share one pinned staging
    * snapshot; a violating batch aborts with the warehouse untouched).
    * This is the reference's cron unit (dags/Dashboard-pipeline.py:20-40)
    * with the transactionality its BigQuery sink provides server-side. */
  def runEpochAtomic(spark: SparkSession, src: Sources, dirs: Dirs,
      windowStartIso: String, windowEndIso: String, loadSeq: Long,
      checks: Seq[(String, String)]): Unit = {
    stageEpoch(spark, src, dirs, windowStartIso, windowEndIso)
    graft.sinks.Constraints.drainChecked(spark, dirs.stagingDir,
      dirs.warehouseDir, loadSeq, checks)
  }

  /** The WHOLE pipeline on the STREAMING ENGINE: each micro-batch of
    * arriving videos runs one full [[runEpochAtomic]] epoch — DSv2/file
    * source → stages 1–6 → CHECK-gated exactly-once AtomicWarehouse
    * drain — under whatever trigger the caller starts it with
    * (`Trigger.AvailableNow` reproduces the reference's cron cadence:
    * drain everything pending, then stop; a processing-time trigger
    * would be the continuous deployment). Checkpointed offsets make a
    * restarted run resume at the first unprocessed batch; a re-run
    * micro-batch around a crash re-stages and re-commits the SAME
    * epoch seq, which [[graft.sinks.AtomicWarehouse.commitEpoch]]
    * no-ops — exactly-once per epoch end-to-end.
    *
    * Scale: the stream side never shuffles before staging (dim joins are
    * broadcasts); per-epoch cost is the batch pipeline's. State lives in
    * the source checkpoint only — the pipeline itself is stateless
    * across epochs by design (staging is truncated each drain, the
    * warehouse merge is read-side). */
  def streamEpochs(spark: SparkSession, videoStream: DataFrame,
      srcFor: DataFrame => Sources, dirs: Dirs,
      windowStartIso: String, windowEndIso: String,
      checks: Seq[(String, String)], checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    videoStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        runEpochAtomic(spark, srcFor(batch), dirs,
          windowStartIso, windowEndIso, loadSeq = id + 1, checks)
      }
      .start()
}
