package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 39: the training-set OUTPUT side — seeded
  * pseudo-random shard shuffling (the "global shuffle" every training
  * run wants ahead of sequential reads) — and binary-blob ingestion
  * through Spark's `binaryFile` source feeding the real PNG codec.
  */
object Extended39 {

  /** P12 — deterministic shard SHUFFLE: every document is assigned a
    * shard by a seeded cryptographic hash (md5 of seed‖doc_id → 64
    * shards) and an intra-shard sort position by the hash's next bits,
    * which together are a reproducible pseudo-random permutation of the
    * corpus — the global shuffle training pipelines run so sequential
    * shard reads see i.i.d.-ish data, with none of `rand()`'s
    * nondeterminism. The query emits per-shard occupancy plus an
    * order-sensitive fingerprint (md5 of the concatenated first-5
    * intra-shard doc ids), so both the ASSIGNMENT and the intra-shard
    * ORDER are hash-checked.
    *
    * Scale: assignment is scan-side arithmetic; materializing the
    * shuffle is one `repartition(shards)` + `sortWithinPartitions(pos)`
    * write — a single bounded shuffle no matter the corpus size, and
    * shard balance (pinned here as max/min occupancy) keeps every
    * downstream reader's file sizes uniform. */
  val p12ShardShuffle = q("p12_shard_shuffle",
    """WITH h AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5('seed7:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 64 AS shard_id,
      |         substr(md5('seed7:' || CAST(doc_id AS VARCHAR)), 7, 10) AS pos
      |  FROM documents),
      |r AS (
      |  SELECT shard_id, doc_id,
      |         row_number() OVER (PARTITION BY shard_id ORDER BY pos ASC, doc_id ASC) AS rk
      |  FROM h)
      |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
      |       md5(string_agg(CASE WHEN rk <= 5 THEN CAST(doc_id AS VARCHAR) END, ','
      |                      ORDER BY rk ASC)) AS head_sig
      |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
    val hash = md5(concat(lit("seed7:"), col("doc_id").cast("string")))
    val h = Tables.documents(s, d).select(
      col("doc_id"),
      (conv(substring(hash, 1, 6), 16, 10).cast("long") % 64).as("shard_id"),
      substring(hash, 7, 10).as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard_id").orderBy(col("pos").asc, col("doc_id").asc)
    h.withColumn("rk", row_number().over(w))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws(",",
          slice(sort_array(collect_list(struct(col("rk"), col("doc_id")))), 1, 5)
            .getField("doc_id").cast("array<string>"))).as("head_sig"))
  }

  /** M13 — binary-blob ingestion via Spark's `binaryFile` SOURCE: real
    * PNG files are landed in a directory (one per document id < 40,
    * pixels from the m9 closed form), read back through
    * `spark.read.format("binaryFile")` — the production path for image
    * corpora: (path, length, content) rows with pushed path filters —
    * and the payload bytes decode through the genuine `javax.imageio`
    * codec. Output is the decoded geometry + channel sums keyed by the
    * id parsed from the file name; the oracle recomputes them
    * arithmetically, so the land→scan→decode loop is value-checked
    * end-to-end. (Encoded byte LENGTH is deliberately not emitted —
    * deflate output is encoder-version-specific.)
    *
    * Scale: binaryFile splits per file with a maxBytesPerFile cap, so a
    * billion-image corpus scans in parallel; decode stays scan-side
    * per-partition work as in m9/m12. */
  val m13BinaryfileIngest = q("m13_binaryfile_ingest",
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 40),
      |dims AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h
      |  FROM ids),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, x.x, y.y
      |  FROM dims d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)
      |  WHERE x.x < d.w AND y.y < d.h)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(sum((x * 7 + y * 13 + doc_id) % 256) AS BIGINT) AS r_sum
      |FROM px GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.BinaryOps
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(freshScratch("m13_png")))
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .filter(_ < 40L).collect().foreach { id =>
        val w = (8 + id % 8).toInt
        val h = (8 + (id * 3) % 8).toInt
        val png = BinaryOps.encodePng(w, h, (x, y) =>
          ((((x * 7 + y * 13 + id) % 256).toInt << 16) |
            (((x * 3 + y * 5 + 2 * id) % 256).toInt << 8) |
            ((x + y + 3 * id) % 256).toInt))
        java.nio.file.Files.write(dir.resolve(f"doc_$id%05d.png"), png)
      }
    s.read.format("binaryFile").option("pathGlobFilter", "*.png")
      .load(dir.toString)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1).cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = graft.multimodal.BinaryOps.readImage(bytes)
          require(img != null, s"PNG for doc $id failed to decode")
          var rs = 0L
          var yy = 0
          while (yy < img.getHeight) {
            var xx = 0
            while (xx < img.getWidth) {
              rs += (img.getRGB(xx, yy) >> 16) & 0xFF
              xx += 1
            }
            yy += 1
          }
          (id, img.getWidth, img.getHeight, rs)
        }
      }
      .toDF("doc_id", "width", "height", "r_sum")
  }

  /** E38 — FORWARD as-of join with a match tolerance: each click is
    * paired with the user's next purchase at-or-after it
    * ([[graft.ops.AsOfJoin.asOfForward]] — the reversed-traversal twin
    * of e5's backward join, same one-shuffle-one-sort cost), and the
    * match is null-gated to a 1-hour window — the "did this click
    * convert within the attribution window" primitive. The oracle is
    * DuckDB's native forward `ASOF LEFT JOIN (c.ts <= p.ts)` with the
    * same tolerance gate, so both the direction semantics (earliest
    * following, ties-at-equal-ts match) and the gate are hash-checked.
    *
    * Scale: identical shape to the backward as-of — linear in
    * |left|+|right|, no range-join blowup, one keyed shuffle. */
  val e38AsofForward = q("e38_asof_forward",
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |  WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id AS p_event_id, user_id, ts::TIMESTAMP AS ts, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id,
      |       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
      |            THEN p.p_event_id END AS next_p_event_id,
      |       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
      |            THEN p.p_value END AS next_p_value
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"),
        col("value").as("p_value"))
    val inWindow =
      unix_micros(col("asof_ts")) - unix_micros(col("ts")) <= 3600000000L
    graft.ops.AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts",
        Seq("p_event_id", "p_value", "ts"))
      .select(col("event_id"), col("user_id"),
        when(inWindow, col("asof_p_event_id")).as("next_p_event_id"),
        when(inWindow, col("asof_p_value")).as("next_p_value"))
  }

  val all: Seq[Q] = Seq(p12ShardShuffle, m13BinaryfileIngest, e38AsofForward)
}
