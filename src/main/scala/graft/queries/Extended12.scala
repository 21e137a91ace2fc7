package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-2 widening, part 12: iterative graph ranking in exact fixed-point
  * arithmetic, and product quantization for ANN at scale.
  */
object Extended12 {

  /** G9 — PageRank over the item co-visitation graph (g6's edges, both
    * directions), 5 power iterations, damping 0.85 — computed entirely in
    * 64-bit FIXED-POINT arithmetic (rank scaled by 10^6, every division an
    * explicit integer floor). Floating-point PageRank is shuffle-order-
    * dependent (the in-neighbor sum), so no two runs — let alone two
    * engines — agree bitwise; integer addition is exactly associative, so
    * this formulation is reproducible anywhere, which is also what lets
    * the oracle check it. Dangling-node mass is dropped (documented
    * divergence from the probabilistic formulation; ranks need not sum to
    * the scale).
    *
    * Shape at scale: each iteration is the canonical join-on-src →
    * groupBy-dst pair of shuffles over the edge list; rank and degree
    * tables are node-sized. The DataFrame loop re-plans per iteration —
    * for deep iteration counts the RDD inner loop with a shared
    * HashPartitioner (see graft.text.DupClusters) is the tuned form; at 5
    * iterations plan reuse doesn't pay. */
  val ITERS = 5
  val SCALE = 1000000L

  /** Shared oracle CTE: the co-visitation graph with the relative edge bar
    * (pairs within 90% of the max co-visit count, integer arithmetic) —
    * `it` (user, item), `pairs` (i1 < i2). */
  private[queries] val covisitCte =
    """it AS (
      |  SELECT DISTINCT user_id,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS item
      |  FROM events),
      |pcnt AS (
      |  SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS c
      |  FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2),
      |mx AS (SELECT max(c) AS m FROM pcnt),
      |pairs AS (SELECT i1, i2 FROM pcnt, mx WHERE c * 10 >= m * 9)""".stripMargin

  /** Spark side of [[covisitCte]]: (distinct user-item pairs, thresholded
    * undirected edge list as i1 < i2). Pair generation is array-local per
    * user (g6's shape) — no positional self-join of the fact table. */
  private[queries] def covisitGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val it = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct()
    val pcnt = it.groupBy("user_id").agg(sort_array(collect_set(col("item"))).as("a"))
      .select(explode(expr(
        "flatten(transform(a, (x, i) -> transform(slice(a, i + 2, size(a)), " +
          "y -> named_struct('i1', x, 'i2', y))))")).as("p"))
      .groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("cnt"))
    // relative edge bar (within 90% of the max co-visit count): a FIXED
    // count bar can't be right at every corpus size, and the integer form
    // c*10 >= 9*max keeps the threshold FP-free
    val mx = pcnt.agg(max(col("cnt")).as("m"))
    val pairs = pcnt.crossJoin(broadcast(mx))
      .where(col("cnt") * 10 >= col("m") * 9)
      .select("i1", "i2")
    (it, pairs)
  }

  private def pagerankOracle: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH $covisitCte,
        |edges AS (SELECT i1 AS src, i2 AS dst FROM pairs
        |          UNION ALL SELECT i2, i1 FROM pairs),
        |nodes AS (SELECT DISTINCT item AS node FROM it),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        |        FROM edges GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |pr0 AS (SELECT node, 1000000 // n AS pr FROM nodes, tot)
        |""".stripMargin)
    for (k <- 1 to ITERS) {
      sb.append(
        s""",contrib$k AS (
           |  SELECT e.dst AS node, sum(p.pr // d.d) AS c
           |  FROM edges e JOIN pr${k - 1} p ON e.src = p.node
           |  JOIN deg d ON e.src = d.node
           |  GROUP BY 1),
           |pr$k AS (
           |  SELECT n.node,
           |         (15 * 1000000) // (100 * t.n) + (85 * coalesce(c.c, 0)) // 100 AS pr
           |  FROM nodes n CROSS JOIN tot t LEFT JOIN contrib$k c ON n.node = c.node)
           |""".stripMargin)
    }
    sb.append(
      s"""SELECT p.node AS item, CAST(p.pr AS BIGINT) AS pr_fixed,
         |       coalesce(d.d, 0) AS degree
         |FROM pr$ITERS p LEFT JOIN deg d ON p.node = d.node""".stripMargin)
    sb.toString
  }

  val g9Pagerank = q("g9_pagerank", pagerankOracle) { (s, d) =>
    val (it, pairs) = covisitGraph(s, d)
    val edges = pairs.select(col("i1").as("src"), col("i2").as("dst"))
      .unionAll(pairs.select(col("i2").as("src"), col("i1").as("dst")))
      .localCheckpoint(true) // feeds deg + every iteration: cut the LSH-free but still 2-shuffle upstream
    val nodes = it.select(col("item").as("node")).distinct().localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val tot = nodes.agg(count(lit(1)).as("n"))
    var pr: DataFrame = nodes.crossJoin(broadcast(tot))
      .select(col("node"), call_function("div", lit(SCALE), col("n")).as("pr"))
    for (_ <- 1 to ITERS) {
      val contrib = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(broadcast(deg.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(call_function("div", col("pr"), col("d"))).as("c"))
      pr = nodes.crossJoin(broadcast(tot))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (call_function("div", lit(15L * SCALE), lit(100L) * col("n")) +
            call_function("div", lit(85L) * coalesce(col("c"), lit(0L)), lit(100L))).as("pr"))
    }
    pr.join(deg, Seq("node"), "left")
      .select(col("node").as("item"), col("pr").as("pr_fixed"),
        coalesce(col("d"), lit(0L)).as("degree"))
  }

  /** V14 — product quantization (PQ) code assignment: the embedding is
    * split into 4 sub-vectors of 16 dims; each sub-vector is assigned to
    * its nearest sub-codebook centroid (L2, ties to the lowest centroid
    * id), giving a 4-byte code per 64-float vector — the 64× compression
    * that makes billion-scale ANN indexes (IVF-PQ) fit in memory. The
    * codebook here is the deterministic seed set (vec_id <= 10, v7's
    * convention); a trained codebook would come from k-means (v7 is one
    * Lloyd step). `q_err` is the total reconstruction error, the quantity
    * PQ training minimizes.
    *
    * Shape at scale: the codebook broadcasts (4 sub-spaces × 10 centroids),
    * so distance computation is scan-side; the argmin per (vector,
    * sub-space) is v7's deterministic (dist, cid) window — one shuffle
    * keyed by vec_id that the final per-vector pivot reuses. */
  val v14PqCodes = q("v14_pq_codes", {
    val sub = (0 until 4).map { b =>
      s"""list_sum(list_transform(generate_series(${b * 16 + 1}, ${b * 16 + 16}),
         |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) -
         |                 CAST(s.ce[CAST(i AS INT)] AS DOUBLE)) ^ 2)) AS dist$b""".stripMargin
    }.mkString(",\n         ")
    val codeCols = (0 until 4).map(b =>
      s"max(CASE WHEN b = $b THEN cid END) AS code$b").mkString(",\n       ")
    val errCols = (0 until 4).map(b =>
      s"max(CASE WHEN b = $b THEN dist END) AS err$b").mkString(",\n       ")
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id <= 10),
       |pairs AS (
       |  SELECT e.vec_id, s.cid,
       |         $sub
       |  FROM embeddings e CROSS JOIN seeds s),
       |long AS (
       |  SELECT vec_id, cid, CAST(u.b AS INT) AS b,
       |         CASE u.b WHEN 0 THEN dist0 WHEN 1 THEN dist1
       |                  WHEN 2 THEN dist2 ELSE dist3 END AS dist
       |  FROM pairs CROSS JOIN range(0, 4) u(b)),
       |best AS (
       |  SELECT vec_id, b, cid, dist,
       |         row_number() OVER (PARTITION BY vec_id, b
       |                            ORDER BY dist ASC, cid ASC) AS rn
       |  FROM long),
       |codes AS (
       |  SELECT vec_id,
       |       $codeCols,
       |       $errCols
       |  FROM best WHERE rn = 1 GROUP BY 1)
       |SELECT vec_id, code0, code1, code2, code3,
       |       ${rnd("err0 + err1 + err2 + err3", 4)} AS q_err
       |FROM codes""".stripMargin
  }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    def subDist(b: Int) =
      aggregate(zip_with(slice(col("v"), b * 16 + 1, 16), slice(col("c"), b * 16 + 1, 16),
        (a, x) => (a - x) * (a - x)), lit(0.0), (acc, x) => acc + x)
    val long = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"),
        posexplode(array((0 until 4).map(b => subDist(b)): _*)).as(Seq("b", "dist")))
    // argmin as min(struct(dist, cid)) — struct ordering IS (dist asc,
    // cid asc), and unlike the row_number window this keeps a map-side
    // partial phase: each scan task reduces its 10-candidate groups to one
    // row before the vec_id shuffle, which the final pivot then reuses
    val best = long.groupBy("vec_id", "b")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("b"), col("m.cid").as("cid"), col("m.dist").as("dist"))
    val aggs = (0 until 4).map(b =>
        max(when(col("b") === b, col("cid"))).as(s"code$b")) ++
      (0 until 4).map(b =>
        max(when(col("b") === b, col("dist"))).as(s"err$b"))
    best.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), col("code0"), col("code1"), col("code2"), col("code3"),
        round(col("err0") + col("err1") + col("err2") + col("err3"), 4).as("q_err"))
  }

  val all: Seq[Q] = Seq(g9Pagerank, v14PqCodes)
}
