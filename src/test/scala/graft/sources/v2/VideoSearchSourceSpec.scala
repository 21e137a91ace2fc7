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
    assert(planDesc.contains("EqualTo(channel_id,UC002)"),
      s"plan was:\n$planDesc")
    // every predicate (incl. the null guards) absorbed: no residual Filter
    assert(!planDesc.contains("isnotnull"), s"plan was:\n$planDesc")
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

  test("ORDER BY published_at DESC LIMIT n pushes as TopN (order=date + maxResults)") {
    val topn = viaSource.orderBy(col("published_at").desc).limit(2)
    val planDesc = topn.queryExecution.executedPlan.toString
    assert(planDesc.contains("PushedTopN: published_at DESC LIMIT 2"),
      s"plan was:\n$planDesc")
    // fully pushed: Spark drops its own Sort — no TakeOrderedAndProject
    assert(!planDesc.contains("TakeOrderedAndProject"), s"plan was:\n$planDesc")
    val want = viaJson.orderBy(col("published_at").desc).limit(2)
      .select("video_id").collect().map(_.getString(0)).toSet
    assert(topn.select("video_id").collect().map(_.getString(0)).toSet == want)
  }

  test("bare LIMIT pushes into the source (maxResults without order)") {
    val lim = viaSource.limit(3)
    val planDesc = lim.queryExecution.executedPlan.toString
    assert(planDesc.contains("LIMIT 3"), s"plan was:\n$planDesc")
    assert(lim.collect().length == 3)
  }

  test("COUNT/MIN/MAX by channel push completely — no Spark-side aggregate") {
    val a = viaSource.groupBy("channel_id")
      .agg(count(lit(1)).as("n"), min("published_at").as("first_pub"),
        max("published_at").as("last_pub"))
    val planDesc = a.queryExecution.executedPlan.toString
    assert(planDesc.contains("PushedAggregates: [count, min_pub, max_pub] " +
      "GroupBy: [channel_id]"), s"plan was:\n$planDesc")
    assert(!planDesc.contains("HashAggregate"),
      s"aggregate not fully pushed:\n$planDesc")
    val want = viaJson.groupBy("channel_id")
      .agg(count(lit(1)).as("n"), min("published_at").as("first_pub"),
        max("published_at").as("last_pub"))
      .collect().map(_.toSeq).toSet
    assert(a.collect().map(_.toSeq).toSet == want)
  }

  test("global COUNT(*) pushes; pushed filters still apply first") {
    val pred = col("channel_id") === "UC002"
    val a = viaSource.where(pred).agg(count(lit(1)).as("n"))
    val planDesc = a.queryExecution.executedPlan.toString
    assert(planDesc.contains("PushedAggregates: [count] GroupBy: []"),
      s"plan was:\n$planDesc")
    assert(a.collect().head.getLong(0) ==
      viaJson.where(pred).count())
  }

  test("an aggregate the API cannot answer falls back to Spark") {
    val a = viaSource.groupBy("channel_id").agg(sum("ingest_seq").as("s"))
    val planDesc = a.queryExecution.executedPlan.toString
    assert(!planDesc.contains("PushedAggregates"), s"plan was:\n$planDesc")
    assert(planDesc.contains("HashAggregate"), s"plan was:\n$planDesc")
    val want = viaJson.groupBy("channel_id").agg(sum("ingest_seq").as("s"))
      .collect().map(_.toSeq).toSet
    assert(a.collect().map(_.toSeq).toSet == want)
  }

  test("transient page-fetch failures are retried to a complete result") {
    val flaky = spark.read.format("graft-videos")
      .option("path", fixture("videos_epoch1.json"))
      .option("simulateTransientFailures", "2") // first 2 fetch attempts 503
      .option("retryMaxAttempts", "4")
      .option("retryBackoffMs", "1")
      .load()
    // retries happen inside the partition reader: full, exact rows come
    // back with no task restart and no dropped/duplicated page
    assert(flaky.collect().map(_.toSeq).toSet ==
      viaJson.collect().map(_.toSeq).toSet)
  }

  test("a persistent outage exhausts the policy into a terminal failure") {
    val dead = spark.read.format("graft-videos")
      .option("path", fixture("videos_epoch1.json"))
      .option("simulateTransientFailures", "99")
      .option("retryMaxAttempts", "3")
      .option("retryBackoffMs", "1")
      .load()
    val e = intercept[Exception] { dead.collect() }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(messages.contains("failed after 3 attempts"), messages)
  }

  test("backoff is exponential and capped") {
    val p = RetryPolicy(maxAttempts = 5, backoffBaseMs = 100L, backoffCapMs = 500L)
    assert((0 to 3).map(p.delayMs) == Seq(100L, 200L, 400L, 500L))
  }

  test("a sort the API does not offer is NOT pushed; Spark sorts") {
    val other = viaSource.orderBy(col("video_title").desc).limit(2)
    val planDesc = other.queryExecution.executedPlan.toString
    assert(!planDesc.contains("PushedTopN"), s"plan was:\n$planDesc")
    assert(planDesc.contains("TakeOrderedAndProject"), s"plan was:\n$planDesc")
    val want = viaJson.orderBy(col("video_title").desc).limit(2)
      .select("video_id").collect().map(_.getString(0)).toSeq
    assert(other.select("video_id").collect().map(_.getString(0)).toSeq == want)
  }
}
