package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.vec.Similarity

/** Similarity search over the `embeddings` table (array<float>, 64 dims).
  * Scores are computed in double and rounded to 3dp BEFORE ranking so the
  * (engine-dependent) FP summation order cannot change the result set.
  */
object VecQueries {

  /** Shared DuckDB prelude: one row per (vec_id, dim, double value). */
  private val vecCte =
    """WITH v AS (
      |  SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |norms AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1)""".stripMargin

  /** V1 — brute-force exact cosine top-k (baseline): queries = vec_id<10,
    * k=5. At scale this is the broadcast-queries × corpus scan pattern. */
  val v1BruteTopK = q("v1_cosine_topk",
    vecCte + s"""
      |, scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS cos
      |  FROM v q JOIN v c ON q.i = c.i AND q.vec_id <> c.vec_id
      |  JOIN norms nq ON nq.vec_id = q.vec_id
      |  JOIN norms nc ON nc.vec_id = c.vec_id
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2, nq.nrm, nc.nrm)
      |SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM scored) WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
  }

  /** V2 — label-partitioned exact top-k: the IVF pattern (search only the
    * query's coarse cell — here the given label plays the centroid-cell
    * role). One shuffle on the cell key instead of a cross join. */
  val v2IvfTopK = q("v2_ivf_label_topk",
    vecCte + s"""
      |, lab AS (SELECT vec_id, label FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS cos
      |  FROM v q
      |  JOIN lab lq ON lq.vec_id = q.vec_id
      |  JOIN lab lc ON lc.label = lq.label AND lc.vec_id <> q.vec_id
      |  JOIN v c ON c.vec_id = lc.vec_id AND q.i = c.i
      |  JOIN norms nq ON nq.vec_id = q.vec_id
      |  JOIN norms nc ON nc.vec_id = c.vec_id
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2, nq.nrm, nc.nrm)
      |SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM scored) WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val c = emb.select(col("vec_id").as("neighbor_id"), col("label"),
      Similarity.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val qs = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val scored = qs.join(c, Seq("label"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** V3 — multi-table hyperplane-LSH ANN (scale path). The md5-derived
    * plane weights are engine-portable, so even the LSH bucketing
    * reproduces in the oracle: weights via hex-digit arithmetic, sign
    * projections, per-table buckets, candidate union, exact re-rank.
    * Recall vs brute force is separately asserted in SimilaritySpec. */
  val v3LshAnn = q("v3_lsh_ann",
    vecCte + s"""
      |, w AS (
      |  SELECT t.t, p.p, j.j,
      |         strpos('0123456789abcdef',
      |                substr(md5('plane:' || t.t || ':' || p.p || ':' || ((j.j - 1) // 32)),
      |                       CAST((j.j - 1) % 32 AS INT) + 1, 1)) - 1 - 7.5 AS wt
      |  FROM range(0, 4) t(t) CROSS JOIN range(0, 3) p(p) CROSS JOIN range(1, 65) j(j)),
      |proj AS (
      |  SELECT v.vec_id, w.t, w.p, sum(v.x * w.wt) AS pr
      |  FROM v JOIN w ON v.i = w.j GROUP BY 1, 2, 3),
      |buckets AS (
      |  SELECT vec_id, t,
      |         CAST(sum(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |  FROM buckets q JOIN buckets c ON q.t = c.t AND q.bucket = c.bucket
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |scored AS (
      |  SELECT cand.query_id, cand.neighbor_id,
      |         ${rnd("sum(qv.x * cv.x) / (nq.nrm * nc.nrm)", 3)} AS cos
      |  FROM cand
      |  JOIN v qv ON qv.vec_id = cand.query_id
      |  JOIN v cv ON cv.vec_id = cand.neighbor_id AND qv.i = cv.i
      |  JOIN norms nq ON nq.vec_id = cand.query_id
      |  JOIN norms nc ON nc.vec_id = cand.neighbor_id
      |  GROUP BY 1, 2, nq.nrm, nc.nrm)
      |SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM scored) WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, dims = 64, planes = 3, tables = 4)
  }

  /** V4 — embedding-cosine near-duplicate detection: same-cell pairs
    * above a similarity threshold (the dedup flavor of the ANN path —
    * cell-local pairs, never a global cross join). */
  val v4EmbeddingNearDup = q("v4_embedding_neardup",
    vecCte + s"""
      |, lab AS (SELECT vec_id, label FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |         ${rnd("sum(a.x * b.x) / (na.nrm * nb.nrm)", 3)} AS cos
      |  FROM v a
      |  JOIN lab la ON la.vec_id = a.vec_id
      |  JOIN lab lb ON lb.label = la.label AND lb.vec_id > a.vec_id
      |  JOIN v b ON b.vec_id = lb.vec_id AND a.i = b.i
      |  JOIN norms na ON na.vec_id = a.vec_id
      |  JOIN norms nb ON nb.vec_id = b.vec_id
      |  GROUP BY 1, 2, na.nrm, nb.nrm)
      |SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.4""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val a = emb.select(col("vec_id").as("id_a"), col("label"),
      Similarity.asDouble(col("embedding")).as("va"))
      .withColumn("na", Similarity.norm(col("va")))
    val b = emb.select(col("vec_id").as("id_b"), col("label"),
      Similarity.asDouble(col("embedding")).as("vb"))
      .withColumn("nb", Similarity.norm(col("vb")))
    a.join(b, Seq("label"))
      .where(col("id_b") > col("id_a"))
      .withColumn("cos", round(
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 3))
      .where(col("cos") >= 0.4)
      .select("id_a", "id_b", "cos")
  }

  /** V8 — ANN recall evaluation: recall@5 of the LSH index (v3) against
    * the brute-force ground truth (v1), per query — the quality metric
    * that justifies (or rejects) an index at 100 TB. Composes the two
    * already-verified queries verbatim (Spark: their DataFrames; oracle:
    * their SQL as derived tables), so the eval measures exactly what the
    * battery ships. */
  val v8AnnRecall = q("v8_ann_recall",
    s"""SELECT e.query_id,
       |       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       |       CAST(count(a.neighbor_id) / 5.0 AS DOUBLE) AS recall_at_5
       |FROM (${v1BruteTopK.oracle.get}) e
       |LEFT JOIN (${v3LshAnn.oracle.get}) a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val exact = v1BruteTopK.fn(s, d).select(col("query_id"), col("neighbor_id"))
    val approx = v3LshAnn.fn(s, d)
      .select(col("query_id"), col("neighbor_id").as("ann_id"))
      .withColumn("hit", lit(1))
    exact.join(approx,
        exact("query_id") === approx("query_id") &&
          col("neighbor_id") === col("ann_id"), "left")
      .drop(approx("query_id"))
      .groupBy("query_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") / 5.0).as("recall_at_5"))
  }

  /** V27 — LSH ANN with the HOT-BUCKET CAP engaged (maxBucket = 16 on a
    * ~62-vector average bucket, so truncation provably fires): the
    * degenerate-bucket bound that keeps the (tbl, bucket) candidate join
    * from going quadratic when a constant/boilerplate embedding cluster
    * saturates one bucket — the ANN twin of the minhash path's
    * d22_lsh_bucket_cap. The md5-ranked corpus truncation is
    * deterministic and engine-portable, so the ORACLE reproduces the
    * exact capped candidate set, not just its size: same weights, same
    * buckets, same md5 rank, same survivors, same re-ranked top-k. */
  val v27LshAnnCapped = q("v27_lsh_ann_capped",
    vecCte + s"""
      |, w AS (
      |  SELECT t.t, p.p, j.j,
      |         strpos('0123456789abcdef',
      |                substr(md5('plane:' || t.t || ':' || p.p || ':' || ((j.j - 1) // 32)),
      |                       CAST((j.j - 1) % 32 AS INT) + 1, 1)) - 1 - 7.5 AS wt
      |  FROM range(0, 4) t(t) CROSS JOIN range(0, 3) p(p) CROSS JOIN range(1, 65) j(j)),
      |proj AS (
      |  SELECT v.vec_id, w.t, w.p, sum(v.x * w.wt) AS pr
      |  FROM v JOIN w ON v.i = w.j GROUP BY 1, 2, 3),
      |buckets AS (
      |  SELECT vec_id, t,
      |         CAST(sum(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY 1, 2),
      |capped AS (
      |  SELECT vec_id, t, bucket FROM (
      |    SELECT vec_id, t, bucket,
      |           row_number() OVER (PARTITION BY t, bucket
      |             ORDER BY md5(CAST(t AS VARCHAR) || ':cap:' ||
      |                          CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |    FROM buckets) WHERE rk <= 16),
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |  FROM buckets q JOIN capped c ON q.t = c.t AND q.bucket = c.bucket
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |scored AS (
      |  SELECT cand.query_id, cand.neighbor_id,
      |         ${rnd("sum(qv.x * cv.x) / (nq.nrm * nc.nrm)", 3)} AS cos
      |  FROM cand
      |  JOIN v qv ON qv.vec_id = cand.query_id
      |  JOIN v cv ON cv.vec_id = cand.neighbor_id AND qv.i = cv.i
      |  JOIN norms nq ON nq.vec_id = cand.query_id
      |  JOIN norms nc ON nc.vec_id = cand.neighbor_id
      |  GROUP BY 1, 2, nq.nrm, nc.nrm)
      |SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
      |  FROM scored) WHERE rn <= 5""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, dims = 64, planes = 3, tables = 4,
      maxBucket = 16)
  }

  val all: Seq[Q] = Seq(v1BruteTopK, v2IvfTopK, v3LshAnn, v4EmbeddingNearDup,
    v8AnnRecall, v27LshAnnCapped)
}
