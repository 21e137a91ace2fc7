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
    // only committed part files + the manifest dir — no task temps remain
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.forall(n => n.startsWith("part-") || n == "_parts"),
      names.mkString(","))
    assert(names.count(_.startsWith("part-")) == 3) // one per task
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
    assert(names.forall(n => n.startsWith("part-") || n == "_parts"),
      s"leftover staged files after abort: ${names.mkString(",")}")
  }

  test("driver crash mid-job-commit: readers see all-or-nothing") {
    val dir = freshDir()
    rows(6).write.format("graft-videos").option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 6)
    // the crash seam kills the driver after 2 of 4 part moves — BEFORE
    // the manifest publish, so the moved parts exist on disk but no
    // manifest references them
    intercept[Exception] {
      rows(20).repartition(4).write.format("graft-videos")
        .option("path", dir).option("simulateCrashAfterMoves", "2")
        .mode("append").save()
    }
    val onDisk = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(onDisk > 1, "crash seam should leave orphaned part files")
    // ...and the reader sees exactly the previously committed 6 rows:
    // no prefix of the crashed job's parts ever becomes visible
    assert(readBack(dir).count() == 6)
    // a clean retry of the append lands atomically on top
    rows(20).repartition(4).write.format("graft-videos")
      .option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 26)
  }

  test("concurrent append jobs serialize through the manifest CAS") {
    val dir = freshDir()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until 2).map { w =>
      val t = new Thread(() => {
        try {
          val df = (1 to 5).map(i => (s"w$w-v$i", s"t$i",
            "2024-01-01T00:00:00Z", "ch0", i.toLong))
            .toDF("video_id", "video_title", "published_at", "channel_id",
              "ingest_seq")
          barrier.await()
          df.write.format("graft-videos").option("path", dir)
            .mode("append").save()
        } catch { case e: Throwable => errs.add(e) }
      })
      t.start(); t
    }
    ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    // both jobs' rows are visible — neither manifest publish clobbered
    // the other's part set
    assert(readBack(dir).count() == 10)
    assert(readBack(dir).where(col("video_id").startsWith("w0-")).count() == 5)
  }

  test("overwrite-vs-append race keeps a consistent committed set") {
    val dir = freshDir()
    rows(8).write.format("graft-videos").option("path", dir).mode("append").save()
    rows(3).write.format("graft-videos").option("path", dir).mode("overwrite").save()
    // truncate REPLACES the visible set in one manifest version: the
    // prior 8 rows are unreferenced (not deleted), the 3 new ones visible
    assert(readBack(dir).count() == 3)
    rows(2).write.format("graft-videos").option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 5)
  }
}
