package graft.sources.v2

import graft.SparkSuite
import graft.pipeline.Schemas
import org.apache.spark.sql.functions._

class VideoSearchSourceSpec extends SparkSuite {

  private def viaSource = spark.read
    .format("graft-videos")
    .option("path", fixture("videos_epoch1.json"))
    .load()

  private def viaJson = spark.read.option("multiLine", "true")
    .schema(Schemas.videoRaw).json(fixture("videos_epoch1.json"))

  test("full scan matches the plain JSON read") {
    assert(viaSource.collect().map(_.toSeq).toSet ==
      viaJson.collect().map(_.toSeq).toSet)
  }

  test("filters are pushed into the source and results stay correct") {
    val pred = col("channel_id") === "UC002" &&
      col("published_at") >= "2024-05-01T00:00:00Z" &&
      col("published_at") <= "2024-05-02T23:59:59Z"
    val got = viaSource.where(pred).select("video_id").collect().map(_.getString(0)).toSet
    val want = viaJson.where(pred).select("video_id").collect().map(_.getString(0)).toSet
    assert(got == want && got == Set("v02", "v05"))

    val planDesc = viaSource.where(pred).queryExecution.executedPlan.toString
    assert(planDesc.contains("graft-videos"))
    assert(planDesc.contains("PushedFilters: [EqualTo(channel_id,UC002)"),
      s"plan was:\n$planDesc")
  }

  test("column pruning reaches the reader (part=snippet analog)") {
    val pruned = viaSource.select("video_id", "published_at")
    val planDesc = pruned.queryExecution.executedPlan.toString
    assert(planDesc.contains("ReadSchema: struct<video_id:string,published_at:string>"),
      s"plan was:\n$planDesc")
    assert(pruned.collect().length == 7)
  }

  test("residual filters (not API-supported) still apply via Spark") {
    val got = viaSource.where(col("video_title").contains("Drama"))
      .select("video_id").collect().map(_.getString(0)).toSet
    assert(got == Set("v05"))
  }
}
