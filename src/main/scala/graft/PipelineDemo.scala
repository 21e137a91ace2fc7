package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, Schemas}

/** Demo consumer of the pipeline API: two overlapping epochs over the
  * committed fixtures, then a replayed drain to show idempotence.
  * `runMain graft.PipelineDemo` — prints the staging/warehouse state a
  * reference user would compare against their sheet/BigQuery. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fixtures = Option(getClass.getResource("/fixtures/channels.json"))
      .map(_.getPath.stripSuffix("/channels.json"))
      .getOrElse("src/test/resources/fixtures")
    val (ch, emp, sh, cpm) = Pipeline.loadDims(spark, fixtures)
    def videos(f: String) = spark.read.option("multiLine", "true")
      .schema(Schemas.videoRaw).json(s"$fixtures/$f")
    val facts = spark.read.option("multiLine", "true")
      .schema(Schemas.analyticsFacts).json(s"$fixtures/analytics_facts.json")
    def sources(f: String) = Pipeline.Sources(videos(f), ch, emp, sh, cpm,
      facts, Seq("owner1", "owner2", "owner3"))

    val root = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val dirs = Pipeline.Dirs(s"$root/staging", s"$root/warehouse")

    println("=== epoch 1 (staging after stages 1-6, no drain) ===")
    Pipeline.runEpoch(spark, sources("videos_epoch1.json"), dirs,
      "2024-05-01T00:00:00Z", "2024-05-02T23:59:59Z", 1, drainToWarehouse = false)
    spark.read.parquet(dirs.stagingDir)
      .select("video_id", "channel_name", "main_code", "code", "resource_name",
        "show_name", "cpm_category", "views", "avg_view_duration",
        "engagement_rate", "rpm", "published_time_local")
      .orderBy("video_id").show(20, truncate = false)

    println("=== epoch 2 (overlapping video v02 re-fetched) + drain ===")
    Pipeline.runEpoch(spark, sources("videos_epoch2.json"), dirs,
      "2024-05-03T00:00:00Z", "2024-05-03T23:59:59Z", 2)
    val wh = spark.read.parquet(dirs.warehouseDir)
    println(s"warehouse rows=${wh.count()} stagingRows=${spark.read.parquet(dirs.stagingDir).count()}")
    wh.select("video_id", "video_title", "views", "load_seq")
      .orderBy("video_id").show(20, truncate = false)

    println("=== replayed drain (crash-recovery idempotence) ===")
    sinks.Warehouse.drain(spark, dirs.stagingDir, dirs.warehouseDir, "video_id", 3)
    println(s"warehouse rows after replay=${spark.read.parquet(dirs.warehouseDir).count()}")
    spark.stop()
  }
}
