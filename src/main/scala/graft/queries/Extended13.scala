package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-2 widening, part 13: triangle-based graph structure and the
  * distributed prefix-sum pattern for interval concurrency.
  */
object Extended13 {

  /** G10 — local clustering coefficient: per node, its degree, the number
    * of triangles through it, and cc = 2·tri / (deg·(deg−1)) — the
    * standard community-structure / link-spam signal over the item
    * co-visitation graph (g9's thresholded edges). Triangles are
    * enumerated once as ordered triples a<b<c (each counted exactly once)
    * and credited to all three corners.
    *
    * Shape at scale: the classic two-join triangle enumeration on the
    * ordered edge list — join sizes are bounded by Σ deg(v)², the same
    * bound any distributed triangle count pays; ordering (a<b<c) removes
    * the 6× duplication a naive all-direction join would produce. Both
    * joins key on node ids. Skewed hubs are the known hazard
    * (the ordered form already routes each triangle through its LOWEST
    * corner, which caps the heaviest key's fan-out). */
  val g10TriangleCc = q("g10_triangle_cc",
    s"""WITH ${Extended12.covisitCte},
       |tri AS (
       |  SELECT p1.i1 AS a, p1.i2 AS b, p2.i2 AS c
       |  FROM pairs p1 JOIN pairs p2 ON p1.i2 = p2.i1
       |  JOIN pairs p3 ON p3.i1 = p1.i1 AND p3.i2 = p2.i2),
       |corner AS (
       |  SELECT unnest([a, b, c]) AS node FROM tri),
       |tcnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
       |         FROM corner GROUP BY 1),
       |deg AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS degree
       |  FROM (SELECT i1 AS node FROM pairs UNION ALL SELECT i2 FROM pairs)
       |  GROUP BY 1)
       |SELECT d.node AS item, d.degree, coalesce(t.n_tri, 0) AS n_tri,
       |       ${rnd("2.0 * coalesce(t.n_tri, 0) / (d.degree * (d.degree - 1))", 4)} AS cc
       |FROM deg d LEFT JOIN tcnt t USING (node)
       |WHERE d.degree >= 2""".stripMargin) { (s, d) =>
    val (_, pairs) = Extended12.covisitGraph(s, d)
    val p = pairs.localCheckpoint(true) // feeds 3 join sides + degree
    val tri = p.as("p1")
      .join(p.as("p2"), col("p1.i2") === col("p2.i1"))
      .join(p.as("p3"),
        col("p3.i1") === col("p1.i1") && col("p3.i2") === col("p2.i2"))
      .select(col("p1.i1").as("a"), col("p1.i2").as("b"), col("p2.i2").as("c"))
    val tcnt = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val deg = p.select(col("i1").as("node")).unionAll(p.select(col("i2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(tcnt, Seq("node"), "left")
      .where(col("degree") >= 2)
      .select(col("node").as("item"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
          (col("degree") * (col("degree") - 1)), 4).as("cc"))
  }

  /** E33 — interval concurrency gauge: each event opens a 10-minute
    * activity lease; report, per 15-minute bucket that saw any change,
    * the peak number of simultaneously-open leases. The classic sweep:
    * ±1 deltas at lease open/close, running sum over the global time
    * order (closes before opens at the same second — leases are
    * half-open).
    *
    * Shape at scale: a global ordered running sum is the textbook
    * single-partition window trap (Spark warns "No Partition Defined").
    * This implementation is the DISTRIBUTED prefix-sum decomposition:
    * partition the deltas by hour, run the ordered window WITHIN each
    * hour (parallel, bounded partitions), and add each hour's carry-in —
    * the exclusive running total of hourly delta sums, a window over the
    * hours-count-sized table only. Same numbers, no single-partition
    * shuffle of the fact. */
  val e33Concurrency = q("e33_concurrency",
    """WITH ev AS (
      |  SELECT event_id, epoch_us(ts::TIMESTAMP) // 1000000 AS t FROM events),
      |d AS (
      |  SELECT event_id, t, 1 AS delta FROM ev
      |  UNION ALL
      |  SELECT event_id, t + 600, -1 FROM ev),
      |rs AS (
      |  SELECT t, delta,
      |         sum(delta) OVER (ORDER BY t, delta, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS conc
      |  FROM d)
      |SELECT t // 900 AS bucket, CAST(max(conc) AS BIGINT) AS max_concurrency,
      |       CAST(count(*) AS BIGINT) AS n_changes
      |FROM rs GROUP BY 1""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_id"),
        call_function("div", unix_micros(col("ts")), lit(1000000L)).as("t"))
    val deltas = ev.select(col("event_id"), col("t"), lit(1).as("delta"))
      .unionAll(ev.select(col("event_id"), (col("t") + 600).as("t"), lit(-1).as("delta")))
      .withColumn("hour", call_function("div", col("t"), lit(3600L)))
    // phase 1: ordered prefix sum WITHIN each hour partition (parallel)
    val local = Window.partitionBy("hour")
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase 2: carry-in per hour = exclusive running total of hour sums
    // (window over the tiny hours table, not the fact)
    val carryW = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = deltas.groupBy("hour").agg(sum("delta").as("hsum"))
      .select(col("hour"), coalesce(sum("hsum").over(carryW), lit(0L)).as("carry"))
    deltas
      .withColumn("local", sum("delta").over(local))
      .join(broadcast(carries), Seq("hour"))
      .select(col("t"), (col("carry") + col("local")).as("conc"))
      .groupBy(call_function("div", col("t"), lit(900L)).as("bucket"))
      .agg(max("conc").as("max_concurrency"), count(lit(1)).as("n_changes"))
  }

  val all: Seq[Q] = Seq(g10TriangleCc, e33Concurrency)
}
