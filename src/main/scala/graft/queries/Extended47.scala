package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 47: diversity-driven coreset selection,
  * local-push personalized PageRank, and Holt double-exponential
  * smoothing.
  */
object Extended47 {

  /** P15 — k-center coreset by farthest-first traversal (Gonzalez '85,
    * the 2-approximation): starting from vector 0, repeatedly add the
    * point FARTHEST from the chosen set (ties to the smallest id) until
    * k=8 centers exist — the classic diversity-maximizing selection used
    * for embedding-space coreset curation (cover the space, don't sample
    * the densest mode 8 times). Distances are the v-family's fixed-order
    * array sums; the argmax is min(struct(−dist, id)) so ties resolve
    * identically in both engines. Output: each center with its distance
    * to the previously-chosen set (the covering-radius trajectory).
    *
    * Shape at scale: each of the 7 rounds is one broadcast of the ≤8
    * chosen centers + one scan computing min-dist + one argmax agg —
    * O(k·n) total distance work, no pairwise corpus term; the driver
    * holds only the 8 chosen ids (the same bounded-coordination shape as
    * g15's peeling loop). */
  val p15KcenterCoreset = q("p15_kcenter_coreset", {
    def dSql(a: String, b: String) =
      s"""list_sum(list_transform(generate_series(1, 64),
         |  i -> (CAST($a[CAST(i AS INT)] AS DOUBLE) - CAST($b[CAST(i AS INT)] AS DOUBLE)) ^ 2))""".stripMargin
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |ch0 AS (SELECT CAST(0 AS BIGINT) AS rank, vec_id, CAST(0 AS DOUBLE) AS d2
         |        FROM e WHERE vec_id = 0)""".stripMargin)
    for (t <- 1 to 7) sb.append(
      s""",
         |md$t AS (
         |  SELECT x.vec_id, min(${dSql("x.v", "c.v")}) AS d2
         |  FROM e x JOIN e c ON c.vec_id IN (SELECT vec_id FROM ch${t - 1})
         |  WHERE x.vec_id NOT IN (SELECT vec_id FROM ch${t - 1})
         |  GROUP BY 1),
         |pk$t AS (
         |  SELECT CAST($t AS BIGINT) AS rank, vec_id, d2 FROM md$t
         |  ORDER BY d2 DESC, vec_id ASC LIMIT 1),
         |ch$t AS (SELECT * FROM ch${t - 1} UNION ALL SELECT * FROM pk$t)""".stripMargin)
    sb.append(
      s"""
         |SELECT rank, vec_id, ${rnd("d2", 4)} AS d2 FROM ch7""".stripMargin)
    sb.toString
  }) { (s, d) =>
    withShufflePartitions(s, 8) {
    def sq(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, z) => acc + z)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    var chosen = emb.where(col("vec_id") === 0)
      .select(lit(0L).as("rank"), col("vec_id"), lit(0.0).as("d2"))
    for (t <- 1 to 7) {
      val centers = chosen.select(col("vec_id").as("cid"))
        .join(emb.withColumnRenamed("vec_id", "cid"), Seq("cid"))
        .select(col("cid"), col("v").as("cv"))
      val pick = emb
        .join(broadcast(chosen.select(col("vec_id"))), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(centers))
        .groupBy("vec_id").agg(min(sq(col("v"), col("cv"))).as("d2"))
        .agg(min(struct((col("d2") * -1).as("nd"), col("vec_id").as("id"))).as("m"))
        .select(lit(t.toLong).as("rank"), col("m.id").as("vec_id"),
          (col("m.nd") * -1).as("d2"))
      chosen = chosen.unionByName(pick).localCheckpoint(true)
    }
    chosen.select(col("rank"), col("vec_id"), round(col("d2"), 4).as("d2"))
    }
  }

  /** G16 — personalized PageRank by FORWARD PUSH (Andersen–Chung–Lang
    * FOCS'06), the local alternative to g9's global power iteration:
    * probability mass starts at one seed (the smallest item) as an
    * integer residual; each sweep moves α=15% of every node's residual
    * into its score and pushes the remaining 85%, split by integer div
    * over degree, to its neighbors. 5 sweeps. All arithmetic is the
    * fixed-point integer discipline g9 established (div remainders are
    * dropped identically in both engines), so scores are exact. Output:
    * per-node score, residual still unpushed, and degree.
    *
    * Shape at scale: a sweep touches only nodes holding residual — mass
    * spreads from the seed outward, so early sweeps are neighborhood-
    * sized, NOT graph-sized (the property that makes push local); each
    * sweep is one join against the (checkpointed) edge list + one
    * groupBy, same bounded shapes as g9. */
  val g16PprPush = q("g16_ppr_push", {
    val S = 1000000000000L // fixed-point scale
    val sb = new StringBuilder
    sb.append(
      s"""WITH ${Extended12.covisitCte},
         |edges AS (SELECT i1 AS src, i2 AS dst FROM pairs
         |          UNION ALL SELECT i2, i1 FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
         |seed AS (SELECT min(i1) AS sd FROM pairs),
         |r0 AS (SELECT sd AS node, CAST($S AS BIGINT) AS r FROM seed),
         |p0 AS (SELECT sd AS node, CAST(0 AS BIGINT) AS p FROM seed)""".stripMargin)
    for (t <- 1 to 5) sb.append(
      s""",
         |p$t AS (
         |  SELECT coalesce(p.node, r.node) AS node,
         |         coalesce(p.p, 0) + coalesce((15 * r.r) // 100, 0) AS p
         |  FROM p${t - 1} p FULL OUTER JOIN r${t - 1} r ON p.node = r.node),
         |r$t AS (
         |  SELECT e.dst AS node,
         |         CAST(sum(((85 * r.r) // 100) // g.d) AS BIGINT) AS r
         |  FROM r${t - 1} r JOIN deg g ON r.node = g.src
         |  JOIN edges e ON e.src = r.node
         |  GROUP BY 1)""".stripMargin)
    sb.append(
      """
        |SELECT p.node, p.p AS score,
        |       coalesce(r.r, 0) AS residual, coalesce(g.d, 0) AS degree
        |FROM p5 p LEFT JOIN r5 r ON p.node = r.node
        |LEFT JOIN deg g ON p.node = g.src
        |WHERE p.p > 0 OR coalesce(r.r, 0) > 0""".stripMargin)
    sb.toString
  }) { (s, d) =>
    withShufflePartitions(s, 8) {
    val S = 1000000000000L
    val (_, pairs) = Extended12.covisitGraph(s, d)
    val edges = pairs.select(col("i1").as("src"), col("i2").as("dst"))
      .unionAll(pairs.select(col("i2").as("src"), col("i1").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val seed = pairs.agg(min("i1").as("sd"))
    var r: DataFrame = seed.select(col("sd").as("node"), lit(S).as("r"))
    var p: DataFrame = seed.select(col("sd").as("node"), lit(0L).as("p"))
    for (_ <- 1 to 5) {
      // p is NOT checkpointed: each p_t is one narrow full-outer join of
      // p_{t-1} with the (checkpointed) r_{t-1}, consumed exactly once —
      // materializing it per sweep paid one blocking job per iteration
      // for lineage truncation nothing needs (5 joins of frontier-sized
      // frames is a trivial plan). r IS checkpointed: r_{t-1} feeds both
      // p_t and r_t, so without materialization the r-chain would
      // recompute exponentially.
      p = p.as("p").join(r.as("r"), col("p.node") === col("r.node"), "full_outer")
        .select(coalesce(col("p.node"), col("r.node")).as("node"),
          (coalesce(col("p.p"), lit(0L)) +
            coalesce(expr("(15 * r) div 100"), lit(0L))).as("p"))
      r = r.join(broadcast(deg.withColumnRenamed("src", "node")), Seq("node"))
        .join(edges.withColumnRenamed("src", "node"), Seq("node"))
        .groupBy(col("dst").as("node2"))
        .agg(sum(expr("((85 * r) div 100) div d")).as("r"))
        .select(col("node2").as("node"), col("r"))
        .localCheckpoint(true)
    }
    p.as("p").join(r.as("r"), col("p.node") === col("r.node"), "left")
      .join(deg.withColumnRenamed("src", "node2"),
        col("p.node") === col("node2"), "left")
      .where(col("p.p") > 0 || coalesce(col("r.r"), lit(0L)) > 0)
      .select(col("p.node").as("node"), col("p.p").as("score"),
        coalesce(col("r.r"), lit(0L)).as("residual"),
        coalesce(col("d"), lit(0L)).as("degree"))
    }
  }

  /** E43 — Holt double-exponential smoothing (level + trend) over
    * per-type daily event counts: the forecasting recursion
    * ℓₜ = x/2 + (ℓ+b)/2, bₜ = (ℓₜ−ℓ)/4 + 3b/4 is a FOLD (like e42's
    * CUSUM, not a window), run array-local per series with α=1/2, β=1/4
    * so every constant is a power of two — both engines execute the
    * identical IEEE operation sequence, making the float fold
    * bit-identical before the guard rounding. Output: final level,
    * trend, and the one-step forecast ℓ+b per event type.
    *
    * Shape at scale: identical to e42 — day-granularity groupBy, then a
    * calendar-bounded per-type fold. */
  val e43HoltLinear = q("e43_holt_linear",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts::TIMESTAMP AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |ser AS (
      |  SELECT event_type,
      |         list_transform(list_sort(list(struct_pack(d := day, c := c))),
      |                        s -> CAST(s.c AS DOUBLE)) AS cs
      |  FROM daily GROUP BY 1),
      |folded AS (
      |  SELECT event_type, len(cs) AS ndays,
      |         list_reduce(
      |           list_prepend([cs[1], cs[2] - cs[1]],
      |             list_transform(cs[3:], x -> [x, CAST(0 AS DOUBLE)])),
      |           (acc, e) -> [
      |             e[1] / 2 + (acc[1] + acc[2]) / 2,
      |             (e[1] / 2 + (acc[1] + acc[2]) / 2 - acc[1]) / 4 + 3 * acc[2] / 4
      |           ]) AS f
      |  FROM ser WHERE len(cs) >= 2)
      |SELECT event_type, CAST(ndays AS BIGINT) AS ndays,
      |       RND1 AS level,
      |       RND2 AS trend,
      |       RND3 AS forecast
      |FROM folded""".stripMargin
      .replace("RND1", rnd("f[1]", 4))
      .replace("RND2", rnd("f[2]", 4))
      .replace("RND3", rnd("f[1] + f[2]", 4))) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy("event_type")
      .agg(expr("transform(array_sort(collect_list(struct(day, c))), s -> CAST(s.c AS DOUBLE))").as("cs"))
      .where(size(col("cs")) >= 2)
      .withColumn("f", expr(
        """aggregate(
          |  transform(slice(cs, 3, greatest(size(cs) - 2, 0)), x -> array(x, 0D)),
          |  array(element_at(cs, 1), element_at(cs, 2) - element_at(cs, 1)),
          |  (acc, e) -> array(
          |    e[0] / 2 + (acc[0] + acc[1]) / 2,
          |    (e[0] / 2 + (acc[0] + acc[1]) / 2 - acc[0]) / 4 + 3 * acc[1] / 4))""".stripMargin))
      .select(col("event_type"), size(col("cs")).cast("long").as("ndays"),
        round(col("f").getItem(0), 4).as("level"),
        round(col("f").getItem(1), 4).as("trend"),
        round(col("f").getItem(0) + col("f").getItem(1), 4).as("forecast"))
  }

  val all: Seq[Q] = Seq(p15KcenterCoreset, g16PprPush, e43HoltLinear)
}
