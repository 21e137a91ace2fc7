package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 widening, part 55: runtime partition pruning and decoded-pixel
  * statistics. */
object Extended55 {

  /** C17 — DYNAMIC partition pruning (the runtime sibling of c8's static
    * prune): the fact side is a hive-partitioned warehouse on
    * `event_type`, and the filter arrives on the DIMENSION side
    * (`category = 'conversion'`), so which fact partitions survive is not
    * knowable at planning time. Catalyst inserts a
    * `dynamicpruningexpression(event_type IN subquery)` on the fact scan:
    * the dim side's broadcast result prunes fact DIRECTORIES at runtime
    * before any fact I/O — here 2 of 5 partitions are read
    * (PlanAuditSpec pins the pruning expression and the runtime
    * partition count). The oracle replays the join over the raw table,
    * so the layout must stay semantically invisible.
    *
    * Scale: this is THE star-schema pattern at 100 TB — "revenue for
    * category X" touches only the partitions the dim filter selects,
    * without the user naming them; static pruning (c8) can't express it
    * because the partition set depends on dim data. */
  val c17DynamicPruning = q("c17_dynamic_partition_pruning",
    """WITH dim AS (
      |  SELECT DISTINCT event_type,
      |         CASE WHEN event_type IN ('purchase', 'signup')
      |              THEN 'conversion' ELSE 'engagement' END AS category
      |  FROM events)
      |SELECT e.event_type, CAST(e.ts::TIMESTAMP AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |WHERE d.category = 'conversion'
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val base = freshScratch("c17")
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts", "event_type")
    graft.sinks.Warehouse.appendPartitioned(ev, s"$base/fact", Seq("event_type"))
    // the dim lives in its own parquet table (a real star layout): its
    // category column is data, not a literal the planner could fold away
    ev.select("event_type").distinct()
      .withColumn("category",
        when(col("event_type").isin("purchase", "signup"), lit("conversion"))
          .otherwise(lit("engagement")))
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = s.read.parquet(s"$base/fact")
    val dim = s.read.parquet(s"$base/dim").where(col("category") === "conversion")
    fact.join(dim, Seq("event_type"))
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"))
  }

  /** M17 — per-channel color histograms over GENUINELY DECODED pixels:
    * each doc's PNG (same closed-form pixel function as m9) is encoded
    * and decoded through `javax.imageio`, and the 4-bin-per-channel
    * histogram of the decoded pixels is the output. The oracle computes
    * the same bin counts arithmetically over the pixel grid, so one
    * mis-decoded pixel in any bin breaks the hash. Histograms are the
    * first real statistic a vision-data curation pass computes (exposure/
    * channel-balance gates before training).
    *
    * Scale: decode + histogram are scan-side per-partition work; 12
    * small integer columns per image leave the executor, payload bytes
    * never do. */
  val m17ColorHistogram = q("m17_color_histogram",
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT d.doc_id,
      |         (x.x * 7 + y.y * 13 + d.doc_id) % 256 AS r,
      |         (x.x * 3 + y.y * 5 + 2 * d.doc_id) % 256 AS g,
      |         (x.x + y.y + 3 * d.doc_id) % 256 AS b
      |  FROM dims d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)
      |  WHERE x.x < d.w AND y.y < d.h)
      |SELECT doc_id,""".stripMargin +
    Seq("r", "g", "b").flatMap(c => (0 until 4).map(i =>
      s"       CAST(sum(CASE WHEN $c // 64 = $i THEN 1 ELSE 0 END) AS BIGINT) AS ${c}$i"))
      .mkString("\n", ",\n", "\n") +
    "FROM px GROUP BY 1") { (s, d) =>
    import s.implicits._
    import graft.multimodal.BinaryOps
    docIds(s, d) // single-row-group input: repartition or the codec loop below runs serial
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 8).toInt
          val h = (8 + (id * 3) % 8).toInt
          val png = BinaryOps.encodePng(w, h, (x, y) =>
            ((((x * 7 + y * 13 + id) % 256).toInt << 16) |
              (((x * 3 + y * 5 + 2 * id) % 256).toInt << 8) |
              ((x + y + 3 * id) % 256).toInt))
          val img = BinaryOps.readImage(png)
          require(img != null, s"PNG for doc $id failed to decode")
          val hist = Array.ofDim[Long](3, 4)
          var yy = 0
          while (yy < img.getHeight) {
            var xx = 0
            while (xx < img.getWidth) {
              val rgb = img.getRGB(xx, yy)
              hist(0)(((rgb >> 16) & 0xFF) / 64) += 1
              hist(1)(((rgb >> 8) & 0xFF) / 64) += 1
              hist(2)((rgb & 0xFF) / 64) += 1
              xx += 1
            }
            yy += 1
          }
          (id, hist(0)(0), hist(0)(1), hist(0)(2), hist(0)(3),
            hist(1)(0), hist(1)(1), hist(1)(2), hist(1)(3),
            hist(2)(0), hist(2)(1), hist(2)(2), hist(2)(3))
        }
      }
      .toDF("doc_id", "r0", "r1", "r2", "r3", "g0", "g1", "g2", "g3",
        "b0", "b1", "b2", "b3")
  }

  /** C18 — time travel on the atomic warehouse: after two committed
    * epochs, read BOTH historical snapshots — version 1 (epoch 1 only)
    * and version 2 (last-wins merge of both) — from the same directory.
    * The log-structured layout ([[graft.sinks.AtomicWarehouse]]) gives
    * this for free: version manifests are immutable once renamed into
    * place and data dirs are never rewritten, so any past snapshot is
    * just "union the epochs that manifest listed". The oracle replays
    * both snapshots relationally (epoch-1-only ∪ merged), pinning that
    * time travel returns exactly the as-of state, not an approximation.
    *
    * Scale: a snapshot read costs the same as a current read (scan +
    * one key-shuffle merge); history costs zero extra storage beyond
    * the epochs already kept — retention = deleting old manifests. */
  val c18TimeTravel = q("c18_time_travel",
    """WITH e1 AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey,
      |         c_mktsegment, CAST(1 AS BIGINT) AS load_seq
      |  FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS c_custkey,
      |         'REFETCHED' AS c_mktsegment, CAST(2 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey < 10),
      |merged AS (
      |  SELECT c_custkey, c_mktsegment, load_seq FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                                 ORDER BY load_seq DESC) AS rn
      |    FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)) WHERE rn = 1)
      |SELECT CAST(1 AS BIGINT) AS snap_ver, * FROM e1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS snap_ver, * FROM merged""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val base = freshScratch("c18")
    val staging = s"$base/staging"; val warehouse = s"$base/warehouse"
    val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    cust.write.mode("overwrite").parquet(staging)
    AtomicWarehouse.drain(s, staging, warehouse, 1L)
    Tables.customer(s, d).where(col("c_nationkey") < 10)
      .select(col("c_custkey"), lit("REFETCHED").as("c_mktsegment"))
      .write.mode("overwrite").parquet(staging)
    AtomicWarehouse.drain(s, staging, warehouse, 2L)
    val v1 = AtomicWarehouse.readVersion(s, warehouse, "c_custkey", 1L)
    val v2 = AtomicWarehouse.readVersion(s, warehouse, "c_custkey", 2L)
    v1.withColumn("snap_ver", lit(1L))
      .unionByName(v2.withColumn("snap_ver", lit(2L)))
      .select("snap_ver", "c_custkey", "c_mktsegment", "load_seq")
  }

  val all: Seq[Q] = Seq(c17DynamicPruning, m17ColorHistogram, c18TimeTravel)
}
