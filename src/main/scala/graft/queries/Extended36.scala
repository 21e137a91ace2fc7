package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 36: the DSv2 connector's server-side sort +
  * pagination (W3/W5) promoted from spec-only to an oracle-checked
  * battery entry.
  */
object Extended36 {

  /** Fixture directory per canonical sf dir, so warmup + timed runs (and
    * repeated battery executions in one JVM) build it exactly once. The
    * build itself is executor-side (`df.write.json` → JSONL part files);
    * the driver never materializes the corpus — the earlier per-execution
    * `collect()` + StringBuilder was the one O(corpus) driver hotspot in
    * the battery and regressed s9 10× in the round-4 tail. */
  private[queries] val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** FIXED fixture path per sf dir (not a fresh temp dir per JVM:
    * `deleteOnExit` never removes a non-empty directory, so the old
    * per-JVM dirs accumulated in tmpdir forever — the disk-growth pattern
    * `freshScratch` exists to kill). The fixture is pure function of the
    * sf dir, so a COMPLETE dir (Spark's `_SUCCESS` marker present) is
    * reused across JVMs — repeated battery runs now skip the build
    * entirely; an incomplete leftover is rebuilt via overwrite. */
  private[queries] def videosFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(
      new java.io.File(d).getCanonicalPath,
      canon => {
        val dir = new java.io.File(sys.props("java.io.tmpdir"),
          "graft_s9_videos_" + canon.replaceAll("[^A-Za-z0-9]", "_"))
        if (!new java.io.File(dir, "_SUCCESS").exists()) {
          Tables.orders(s, d)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(
              concat(lit("v"), col("o_orderkey").cast("string")).as("video_id"),
              col("o_orderpriority").as("video_title"),
              date_format(
                timestamp_seconds(lit(1577836800L) + col("o_orderkey")),
                "yyyy-MM-dd'T'HH:mm:ss'Z'").as("published_at"),
              concat(lit("ch"), (col("o_custkey") % 7).cast("string"))
                .as("channel_id"),
              col("o_orderkey").as("ingest_seq"))
            .coalesce(1) // one page-ordered "response" file; write is still executor-side
            .write.mode("overwrite").json(dir.toString)
        }
        dir.toString
      })

  /** S9 — DSv2 source-side TopN (W3 order:date + W4/W5 maxResults): a
    * videos fixture is derived deterministically from `orders` (the
    * hermetic stand-in for the search API's backing store — one row per
    * urgent order, published_at made UNIQUE from the orderkey so the sort
    * is total), then read through the `graft-videos` DSv2 connector with
    * a pushed channel filter and `ORDER BY published_at DESC LIMIT 25` —
    * which the connector absorbs as PushedTopN (Catalyst plans no Sort or
    * Limit of its own; VideoSearchSourceSpec pins that plan shape). The
    * oracle computes the same top-25 straight from `orders`, so the
    * connector's filter + sort + pagination contract — not just its plan
    * — is hash-verified.
    *
    * Scale: TopN at the source is the difference between shipping 25 rows
    * and shipping the channel's full history; pages map to InputPartitions
    * so an unpushable query still scans in parallel. */
  val s9Dsv2TopN = q("s9_dsv2_topn",
    """WITH v AS (
      |  SELECT 'v' || CAST(o_orderkey AS VARCHAR) AS video_id,
      |         o_orderpriority AS video_title,
      |         strftime(TIMESTAMP '2020-01-01 00:00:00' + to_seconds(o_orderkey),
      |                  '%Y-%m-%dT%H:%M:%SZ') AS published_at,
      |         'ch' || CAST(o_custkey % 7 AS VARCHAR) AS channel_id
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT video_id, video_title, published_at, channel_id
      |FROM v WHERE channel_id = 'ch3'
      |ORDER BY published_at DESC LIMIT 25""".stripMargin) { (s, d) =>
    val fixture = videosFixture(s, d)
    s.read.format("graft-videos").option("path", fixture).load()
      .where(col("channel_id") === "ch3")
      .orderBy(col("published_at").desc)
      .limit(25)
      .select("video_id", "video_title", "published_at", "channel_id")
  }

  val all: Seq[Q] = Seq(s9Dsv2TopN)
}
