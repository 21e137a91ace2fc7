package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 43: exact-budget apportionment sampling and
  * frequency-domain exact quantiles.
  */
object Extended43 {

  /** P13 — exact-budget quota sampling (Hamilton's largest-remainder
    * apportionment): allocate a fixed document budget (300) across
    * sources proportional to their counts so the quotas sum EXACTLY to
    * the budget — floor quotas first (t21 stops there and under-spends),
    * then the leftover seats go to the largest fractional remainders
    * (remainder = B·n mod N, all-integer). Within a source the quota is
    * filled in md5-hash order — the same deterministic "random" draw
    * every sampler in the battery uses. The output is the per-source
    * allocation audit: count, base, remainder rank, final quota, drawn.
    *
    * Shape at scale: source-count agg (one shuffle), a source-sized
    * window for the remainder ranking (tiny), and a per-source
    * row_number window over documents — the draw never materializes a
    * global sort. */
  val p13QuotaSample = q("p13_quota_sample",
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k FROM c),
      |base AS (
      |  SELECT source, n, (300 * n) // nn AS b, (300 * n) % nn AS rem
      |  FROM c, tot),
      |seats AS (SELECT CAST(300 - sum(b) AS BIGINT) AS r FROM base),
      |alloc AS (
      |  SELECT source, n, b, rem,
      |         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
      |  FROM base),
      |quota AS (
      |  SELECT source, n, b + CASE WHEN rk <= (SELECT r FROM seats) THEN 1 ELSE 0 END AS quota
      |  FROM alloc),
      |ranked AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT q.source, q.n, CAST(q.quota AS BIGINT) AS quota,
      |       CAST(count(r.doc_id) AS BIGINT) AS drawn,
      |       min(CASE WHEN r.rn = 1 THEN r.doc_id END) AS first_doc
      |FROM quota q LEFT JOIN ranked r
      |  ON q.source = r.source AND r.rn <= q.quota
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = c.agg(sum("n").cast("long").as("nn"))
    val base = c.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        call_function("div", lit(300L) * col("n"), col("nn")).as("b"),
        ((lit(300L) * col("n")) % col("nn")).as("rem"))
    val seats = base.agg((lit(300L) - sum("b")).as("r"))
    val quota = base
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source").asc)))
      .crossJoin(broadcast(seats))
      .select(col("source"), col("n"),
        (col("b") + when(col("rk") <= col("r"), 1L).otherwise(0L)).as("quota"))
    val ranked = docs.withColumn("rn", row_number().over(
      Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
    quota.join(ranked,
        quota("source") === ranked("source") && col("rn") <= col("quota"), "left")
      .groupBy(quota("source"), col("n"), col("quota"))
      .agg(count(col("doc_id")).as("drawn"),
        min(when(col("rn") === 1, col("doc_id"))).as("first_doc"))
  }

  /** A24 — frequency-domain exact quantiles (percentile_disc by counting):
    * per return flag, the exact p25/p50/p75 of l_quantity computed from
    * the VALUE-FREQUENCY table — counts per (flag, value), a cumulative
    * window over the ≤50-row frequency table, then the smallest value
    * whose cumulative count reaches ⌈p·n⌉. a10 is the sort-based
    * percentile aggregate (O(n log n) per group, full data movement);
    * this is the low-cardinality-domain alternative that aggregates to
    * O(distinct values) FIRST — at 100 TB the frequency table is KB-sized
    * regardless of row count, which is why real engines build histogram
    * statistics this way. All-integer thresholds (⌈p·n⌉ via (p·n + q−1)
    * div q) — no float rank arithmetic anywhere.
    *
    * Shape at scale: one partial-aggregable groupBy (map-side combine
    * collapses to the 50-value domain per task), then windows over
    * rows-per-flag ≤ distinct-values — constant-size state. */
  val a24FreqQuantiles = q("a24_freq_quantiles",
    """WITH f AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT flag, v, c,
      |         sum(c) OVER (PARTITION BY flag ORDER BY v ASC
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(c) OVER (PARTITION BY flag) AS n
      |  FROM f)
      |SELECT flag, CAST(max(n) AS BIGINT) AS n,
      |       min(CASE WHEN cum * 4 >= n THEN v END) AS p25,
      |       min(CASE WHEN cum * 2 >= n THEN v END) AS p50,
      |       min(CASE WHEN cum * 4 >= 3 * n THEN v END) AS p75
      |FROM cum GROUP BY 1""".stripMargin) { (s, d) =>
    val f = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("flag").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy("flag")
    f.withColumn("cum", sum("c").over(wc))
      .withColumn("n", sum("c").over(wn))
      .groupBy("flag")
      .agg(max("n").as("n"),
        min(when(col("cum") * 4 >= col("n"), col("v"))).as("p25"),
        min(when(col("cum") * 2 >= col("n"), col("v"))).as("p50"),
        min(when(col("cum") * 4 >= lit(3) * col("n"), col("v"))).as("p75"))
  }

  /** G15 — k-core decomposition by iterative peeling (Batagelj–Zaveršnik,
    * 5 bounded rounds, k=3) over the part co-purchase graph (parts
    * co-ordered ≥2 times): each round drops every node whose degree in
    * the SURVIVING subgraph is < k, which lowers neighbors' degrees and
    * cascades — the standard dense-subgraph extraction that one-shot
    * degree filters (g13's histogram world) can't express. Output is the
    * per-round (nodes, edges) cascade audit, never empty even when the
    * 3-core itself is (at sf0.1 the cascade legitimately empties by
    * round 2 — the co-purchase graph is relatively sparser at 10×).
    *
    * Shape at scale: the edge list builds once (checkpointed); each
    * round is two semi-joins against the shrinking alive-set plus one
    * degree groupBy — cost is proportional to SURVIVING edges, so rounds
    * get cheaper as the cascade bites. Bounded rounds (not to-fixpoint)
    * keep the plan static; a production peel would loop the same step
    * under the DupClusters-style RDD harness. */
  val g15KCore = q("g15_kcore", {
    val sb = new StringBuilder
    sb.append(
      """WITH p AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS pk FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.pk AS i1, b.pk AS i2 FROM p a JOIN p b ON a.o = b.o AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |ed AS MATERIALIZED (SELECT i1 AS a, i2 AS b FROM e UNION ALL SELECT i2, i1 FROM e),
        |n0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM ed)""".stripMargin)
    for (i <- 1 to 5) sb.append(
      s""",
         |d$i AS MATERIALIZED (SELECT ed.a AS node, CAST(count(*) AS BIGINT) AS c FROM ed
         |        JOIN n${i - 1} x ON ed.a = x.node
         |        JOIN n${i - 1} y ON ed.b = y.node GROUP BY 1),
         |n$i AS MATERIALIZED (SELECT node FROM d$i WHERE c >= 3)""".stripMargin)
    // round 0 edge count is the full undirected edge list
    sb.append("\n" + (
      s"""SELECT 0 AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM n0) AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges""".stripMargin +:
        (1 to 5).map { i =>
          s"""SELECT $i AS round,
             |  (SELECT CAST(count(*) AS BIGINT) FROM n$i) AS n_nodes,
             |  (SELECT CAST(coalesce(sum(c), 0) // 2 AS BIGINT) FROM
             |     (SELECT CAST(count(*) AS BIGINT) AS c FROM ed
             |      JOIN n$i x ON ed.a = x.node JOIN n$i y ON ed.b = y.node
             |      GROUP BY ed.a)) AS n_edges""".stripMargin
        }).mkString("\nUNION ALL\n"))
    sb.toString
  }) { (s, d) =>
    withShufflePartitions(s, 8) {
    val p = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("pk")).distinct()
    val pairs = p.as("a").join(p.as("b"),
        col("a.o") === col("b.o") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("i1"), col("b.pk").as("i2"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 2)
      .select("i1", "i2")
    val ed = pairs.select(col("i1").as("a"), col("i2").as("b"))
      .unionAll(pairs.select(col("i2").as("a"), col("i1").as("b")))
      .localCheckpoint(true)
    val nEdges0 = ed.count() / 2
    var alive = ed.select(col("a").as("node")).distinct().localCheckpoint(true)
    var out = Seq((0, alive.count(), nEdges0))
    for (i <- 1 to 5) {
      val deg = ed
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("c"))
      alive = deg.where(col("c") >= 3).select("node").localCheckpoint(true)
      val surv = ed
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .count() / 2
      out = out :+ ((i, alive.count(), surv))
    }
    import s.implicits._
    out.toDF("round", "n_nodes", "n_edges")
    }
  }

  val all: Seq[Q] = Seq(p13QuotaSample, a24FreqQuantiles, g15KCore)
}
