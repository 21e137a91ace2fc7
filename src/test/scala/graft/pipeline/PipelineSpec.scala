package graft.pipeline

import graft.SparkSuite
import graft.sources.DimLoader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end epoch tests over the committed fixtures (FIXTURES.md §1):
  * two overlapping epochs, stage goldens, warehouse-drain idempotence. */
class PipelineSpec extends SparkSuite {

  private def videos(name: String): DataFrame =
    spark.read.option("multiLine", "true").schema(Schemas.videoRaw)
      .json(fixture(name))

  private def facts: DataFrame =
    spark.read.option("multiLine", "true").schema(Schemas.analyticsFacts)
      .json(fixture("analytics_facts.json"))

  private def sources(videoFile: String): Pipeline.Sources = {
    val dimDir = fixture("channels.json").stripSuffix("/channels.json")
    val (ch, emp, sh, cpm) = Pipeline.loadDims(spark, dimDir)
    Pipeline.Sources(videos(videoFile), ch, emp, sh, cpm, facts,
      Seq("owner1", "owner2", "owner3"))
  }

  private def tmpDirs(): Pipeline.Dirs = {
    val root = Files.createTempDirectory("graft_pipe").toString
    Pipeline.Dirs(s"$root/staging", s"$root/warehouse")
  }

  test("dim loader: duplicate channel ids resolve last-wins") {
    val dimDir = fixture("channels.json").stripSuffix("/channels.json")
    val ch = DimLoader.loadDim(spark, s"$dimDir/channels.json",
      Schemas.channels, "channel_id")
    val m = ch.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("UC001") == "News One HD") // second occurrence wins
    assert(m.size == 4)
  }

  test("epoch 1: full A-AD derivation goldens") {
    val dirs = tmpDirs()
    Pipeline.runEpoch(spark, sources("videos_epoch1.json"), dirs,
      "2024-05-01T00:00:00Z", "2024-05-02T23:59:59Z", loadSeq = 1,
      drainToWarehouse = false)
    val staged = spark.read.parquet(dirs.stagingDir)
    val rows = staged.collect().map(r => r.getAs[String]("video_id") -> r).toMap

    // window filter: v07 (June) excluded
    assert(!rows.contains("v07") && rows.size == 6)

    val v1 = rows("v01")
    assert(v1.getAs[String]("channel_name") == "News One HD") // last-wins dim
    assert(v1.getAs[String]("main_code") == "ABC4")
    assert(v1.getAs[String]("code") == "AB")
    assert(v1.getAs[String]("resource_code") == "4")
    assert(v1.getAs[String]("resource_name") == "Digit Squad")
    assert(v1.getAs[String]("show_name") == "Morning News")
    assert(v1.getAs[String]("category") == "International News")
    // International News keeps show name as cpm_category (J4/F18)
    assert(v1.getAs[String]("cpm_category") == "Morning News")
    assert(v1.getAs[Long]("views") == 1000L)
    assert(v1.getAs[Double]("watch_time_hours") == 83.33)
    assert(v1.getAs[String]("avg_view_duration") == "0:04:31")
    assert(v1.getAs[Long]("net_subscribers") == 17L)
    assert(v1.getAs[Double]("engagement_rate") == 6.5)   // (10+50+5)/1000*100
    assert(v1.getAs[Double]("cpv") == 0.0255)
    assert(v1.getAs[Double]("rpm") == 25.5)
    assert(v1.getAs[String]("published_date_local") == "2024-05-01")
    assert(v1.getAs[String]("published_time_local") == "11:30:00") // +05:00

    val v2 = rows("v02")
    assert(v2.getAs[String]("show_name") == "Evening Talk v2") // dup code last-wins
    assert(v2.getAs[String]("cpm_category") == "Premium")
    assert(v2.getAs[String]("avg_view_duration") == "1 day, 1:01:01") // 90061s
    assert(v2.getAs[Long]("net_subscribers") == -4L)

    // v03: all-digit title purge, zero views guards
    val v3 = rows("v03")
    assert(v3.getAs[String]("main_code") == "")
    assert(v3.getAs[Double]("engagement_rate") == 0.0)
    assert(v3.getAs[Double]("cpv") == 0.0)

    // v04: unknown channel default; no analytics → nulls survive
    val v4 = rows("v04")
    assert(v4.getAs[String]("channel_name") == "Unknown Channel")
    assert(v4.isNullAt(v4.fieldIndex("views")))

    // v05: anti-join owner loop — owner1 wins over owner3
    assert(rows("v05").getAs[Long]("views") == 100L)
  }

  test("epoch 2 after epoch 1: keep-last dedup on re-fetched video") {
    val dirs = tmpDirs()
    Pipeline.runEpoch(spark, sources("videos_epoch1.json"), dirs,
      "2024-05-01T00:00:00Z", "2024-05-02T23:59:59Z", 1, drainToWarehouse = false)
    Pipeline.runEpoch(spark, sources("videos_epoch2.json"), dirs,
      "2024-05-03T00:00:00Z", "2024-05-03T23:59:59Z", 2, drainToWarehouse = false)
    val staged = spark.read.parquet(dirs.stagingDir)
    val titles = staged.collect()
      .map(r => r.getAs[String]("video_id") -> r.getAs[String]("video_title")).toMap
    assert(titles("v02") == "Evening Talk RERUN | K6A") // keep-last
    assert(titles.contains("v08") && titles.size == 7)
  }

  test("warehouse drain: all-string schema, dedup, staging truncated, idempotent replay") {
    val dirs = tmpDirs()
    Pipeline.runEpoch(spark, sources("videos_epoch1.json"), dirs,
      "2024-05-01T00:00:00Z", "2024-05-02T23:59:59Z", 1)
    val wh = spark.read.parquet(dirs.warehouseDir)
    assert(wh.schema.fields.filter(_.name != "load_seq")
      .forall(_.dataType.typeName == "string")) // F20
    assert(wh.count() == 6)
    assert(spark.read.parquet(dirs.stagingDir).count() == 0) // K7 truncate

    // crash-replay: draining an already-drained (empty) staging twice and
    // re-deduping leaves the warehouse unchanged (idempotence, §2.9)
    graft.sinks.Warehouse.drain(spark, dirs.stagingDir, dirs.warehouseDir,
      "video_id", 2)
    assert(spark.read.parquet(dirs.warehouseDir).count() == 6)
  }

  test("atomic epoch: a violating batch is refused, warehouse and manifest untouched") {
    val dirs = tmpDirs()
    // first epoch drains clean
    Pipeline.runEpochAtomic(spark, sources("videos_epoch1.json"), dirs,
      "2024-05-01T00:00:00Z", "2024-05-02T23:59:59Z", loadSeq = 1,
      checks = Seq("video_id_present" -> "video_id IS NOT NULL"))
    assert(graft.sinks.AtomicWarehouse.currentVersion(spark, dirs.warehouseDir) == 1L)
    val before = graft.sinks.AtomicWarehouse
      .read(spark, dirs.warehouseDir, "video_id").count()
    // second epoch declares an unsatisfiable constraint: refused BEFORE
    // anything reaches the warehouse; the first epoch stays intact
    val e = intercept[graft.sinks.ConstraintViolationException] {
      Pipeline.runEpochAtomic(spark, sources("videos_epoch2.json"), dirs,
        "2024-05-03T00:00:00Z", "2024-05-03T23:59:59Z", loadSeq = 2,
        checks = Seq("impossible" -> "len < 0"))
    }
    assert(e.getMessage.contains("impossible"))
    assert(graft.sinks.AtomicWarehouse.currentVersion(spark, dirs.warehouseDir) == 1L)
    assert(graft.sinks.AtomicWarehouse
      .read(spark, dirs.warehouseDir, "video_id").count() == before)
    // fixing the constraint lets the SAME epoch seq proceed
    Pipeline.runEpochAtomic(spark, sources("videos_epoch2.json"), dirs,
      "2024-05-03T00:00:00Z", "2024-05-03T23:59:59Z", loadSeq = 2,
      checks = Seq("video_id_present" -> "video_id IS NOT NULL"))
    assert(graft.sinks.AtomicWarehouse.currentVersion(spark, dirs.warehouseDir) == 2L)
  }
}
