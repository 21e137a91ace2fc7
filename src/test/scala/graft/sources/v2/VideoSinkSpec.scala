package graft.sources.v2

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The DSv2 write path's commit protocol: staged task temps become
  * visible only at job commit; overwrite truncates; a failed job leaves
  * the destination exactly as it was (no torn appends). */
class VideoSinkSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("video_sink_").toString + "/videos"

  private def rows(n: Int) = (1 to n).map(i =>
    (s"v$i", s"title $i", f"2024-01-${(i % 28) + 1}%02dT00:00:00Z", s"ch${i % 3}", i.toLong))
    .toDF("video_id", "video_title", "published_at", "channel_id", "ingest_seq")

  private def readBack(dir: String) =
    spark.read.format("graft-videos").option("path", dir).load()

  test("append round-trips through the read connector, escaping included") {
    val dir = freshDir()
    val df = rows(10)
      // quotes + backslashes must survive the JSONL serialization, and so
      // must CONTROL characters: a raw newline in a title would split the
      // record across physical lines and break the line-oriented reader
      .withColumn("video_title",
        when(col("ingest_seq") === 1, lit("""he said "hi" \ bye"""))
          .when(col("ingest_seq") === 2, lit("line1\nline2\ttabbed\rcr"))
          .otherwise(col("video_title")))
    df.repartition(3).write.format("graft-videos")
      .option("path", dir).mode("append").save()
    val back = readBack(dir)
    assert(back.count() == 10)
    assert(back.where(col("video_id") === "v1")
      .head.getAs[String]("video_title") == """he said "hi" \ bye""")
    assert(back.where(col("video_id") === "v2")
      .head.getAs[String]("video_title") == "line1\nline2\ttabbed\rcr")
    // only committed part files are visible — no task temps remain
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.forall(_.startsWith("part-")), names.mkString(","))
    assert(names.length == 3) // one per task
    // a second append accumulates
    rows(5).write.format("graft-videos").option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 15)
  }

  test("overwrite truncates prior parts") {
    val dir = freshDir()
    rows(10).write.format("graft-videos").option("path", dir).mode("append").save()
    rows(4).write.format("graft-videos").option("path", dir).mode("overwrite").save()
    assert(readBack(dir).count() == 4)
  }

  test("a failed job leaves the destination untouched") {
    val dir = freshDir()
    rows(6).write.format("graft-videos").option("path", dir).mode("append").save()
    val poison = rows(20).withColumn("video_title",
      when(col("ingest_seq") === 13,
        raise_error(lit("boom"))).otherwise(col("video_title")))
    intercept[Exception] {
      poison.repartition(4).write.format("graft-videos")
        .option("path", dir).mode("append").save()
    }
    // the 6 originally committed rows survive; no temps, no partial parts
    assert(readBack(dir).count() == 6)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.forall(_.startsWith("part-")),
      s"leftover staged files after abort: ${names.mkString(",")}")
  }
}
