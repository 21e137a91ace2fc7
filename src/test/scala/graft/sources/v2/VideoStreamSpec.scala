package graft.sources.v2

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The MICRO_BATCH_READ half of the graft-videos connector: bounded
  * admission control, pushdown on the stream path, and exactly-once
  * cursor resume across a cold checkpoint restart. */
class VideoStreamSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFixture(n: Int): String = {
    val dir = freshDir("video_stream_") + "/videos"
    (1 to n).map(i => (f"v$i%03d", s"title $i",
        f"2024-01-${(i % 28) + 1}%02dT00:00:00Z", s"ch${i % 3}", i.toLong))
      .toDF("video_id", "video_title", "published_at", "channel_id",
        "ingest_seq")
      .coalesce(1).write.json(dir)
    dir
  }

  test("AvailableNow drains the fixture in bounded micro-batches, each row once") {
    val dir = writeFixture(40)
    val q = spark.readStream.format("graft-videos")
      .option("path", dir).option("maxRowsPerBatch", 7)
      .load()
      .writeStream.format("memory").queryName("vstream_all")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("vstream_all").select("video_id").as[String]
      .collect().sorted.toSeq
    assert(got == (1 to 40).map(i => f"v$i%03d"))
    // admission control bounded every batch at 7 rows
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.length == 6 && sizes.forall(_ <= 7),
      s"expected 6 bounded batches, got ${sizes.mkString(",")}")
  }

  test("pushed filters apply source-side on the stream path") {
    val dir = writeFixture(30)
    val q = spark.readStream.format("graft-videos")
      .option("path", dir).option("maxRowsPerBatch", 100)
      .load()
      .where(col("channel_id") === "ch1" && col("published_at") >= "2024-01-10")
      .writeStream.format("memory").queryName("vstream_filtered")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("vstream_filtered").collect()
    assert(rows.nonEmpty && rows.forall { r =>
      r.getAs[String]("channel_id") == "ch1" &&
        r.getAs[String]("published_at") >= "2024-01-10"
    })
  }

  test("checkpoint restart resumes the cursor: no duplicate, no skip") {
    val dir = writeFixture(60)
    val checkpoint = freshDir("video_stream_ckpt_")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-videos")
        .option("path", dir).option("maxRowsPerBatch", 9)
        .load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("video_id").collect()
            .foreach(r => seen.add(r.getString(0)))
        }
        .start()
    val q1 = run()
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (q1.recentProgress.isEmpty && q1.isActive &&
        System.nanoTime() < deadline)
      Thread.sleep(10)
    q1.stop() // cold stop mid-drain (arbitrary point after first progress)
    val q2 = run() // resumes from the checkpointed VideoOffset cursor
    q2.awaitTermination()
    // NOTE: foreachBatch output here is at-least-once per batch across a
    // crash (a batch can re-run if the stop landed between side effect
    // and offset commit) — dedup by id mirrors what the warehouse sink
    // does idempotently; what must hold is full coverage and a bounded
    // duplicate set (only the one interrupted batch may repeat).
    import scala.jdk.CollectionConverters._
    val all = seen.asScala.toSeq
    val distinct = all.distinct.sorted
    assert(distinct == (1 to 60).map(i => f"v$i%03d"),
      s"coverage hole after restart: ${distinct.size}/60")
    assert(all.size - distinct.size <= 9,
      s"more than one batch re-ran: ${all.size - distinct.size} dups")
  }
}
