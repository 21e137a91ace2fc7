package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.vec.Similarity

/** Round-2 widening, part 22: similarity-search family continued
  * (v18–v21) — the retrieval shapes a training-data pipeline still
  * lacked after v1–v17: radius (range) search, 1-bit quantized Hamming
  * search with true 64-dims-to-one-long packing, the k-means UPDATE step
  * completing Lloyd's iteration (v7 was assignment only), and MMR
  * diversified re-ranking (Carbonell & Goldstein '98).
  *
  * Scale notes: v18/v19 keep the broadcast-queries × corpus-scan shape
  * (the corpus side never shuffles; output is bounded by matches, not
  * pairs). v19's signature is ONE long per vector — sign-bit compression
  * packs 64 dims into 8 bytes, so at 100 TB the candidate scan reads
  * 0.4% of the float payload and the distance is a single XOR+popcount
  * instruction. v20 is broadcast-assign + map-side partial mean — the
  * canonical distributed Lloyd epoch with no fact shuffle beyond the
  * 640-row partial-aggregate exchange. v21's greedy loop is k fixed tiny
  * stages, each a broadcast argmax over the candidate set — selected-set
  * state stays a one-row broadcast, never a driver collect loop.
  */
object Extended22 {

  private val vecCte =
    """WITH v AS (
      |  SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |norms AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1)""".stripMargin

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

  /** V18 — cosine radius (range) search: all neighbors within a fixed
    * similarity radius of each query, not a fixed count — the dedup /
    * recall-sweep primitive (top-k bounds work; radius bounds quality).
    * Same broadcast-queries scan as v1; output bounded by true matches. */
  val v18RangeSearch = q("v18_range_search",
    vecCte + s"""
      |, scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         sum(q.x * c.x) / (nq.nrm * nc.nrm) AS cos
      |  FROM v q JOIN v c ON q.i = c.i AND q.vec_id <> c.vec_id
      |  JOIN norms nq ON nq.vec_id = q.vec_id
      |  JOIN norms nc ON nc.vec_id = c.vec_id
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2, nq.nrm, nc.nrm)
      |SELECT query_id, neighbor_id, ${rnd("cos", 3)} AS cos
      |FROM scored WHERE cos >= 0.25""".stripMargin) { (s, d) =>
    val e = emb(s, d).withColumn("nrm", Similarity.norm(col("v")))
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qn"))
    e.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .where(col("cos") >= 0.25)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 3).as("cos"))
  }

  /** V19 — 1-bit (sign) quantized Hamming search: each 64-dim vector
    * compresses to ONE long (bit i = sign of dim i), neighbors ranked by
    * Hamming distance = bit_count(sig_q XOR sig_c) — the binary-embedding
    * retrieval pattern (32× smaller index than float32, one CPU
    * instruction per comparison). The oracle computes the same distance
    * dimension-wise; the Spark side actually packs the long. */
  val v19SignHamming = q("v19_sign_hamming",
    vecCte + """
      |, bits AS (
      |  SELECT vec_id, i, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS b FROM v),
      |ham AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         sum(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS hamming
      |  FROM bits q JOIN bits c ON q.i = c.i AND q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2)
      |SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
      |       CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY hamming ASC, neighbor_id ASC) AS rn
      |  FROM ham) WHERE rn <= 5""".stripMargin) { (s, d) =>
    val sig = expr(
      """aggregate(sequence(0, 63),
        |  0L,
        |  (acc, i) -> CASE WHEN element_at(v, i + 1) >= 0
        |              THEN acc | shiftleft(1L, i) ELSE acc END)""".stripMargin)
    val e = emb(s, d).select(col("vec_id"), sig.as("sig"))
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("sig").as("qsig"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    e.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("long").as("hamming"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
  }

  /** V20 — k-means update step (completes Lloyd's iteration with
    * v7_kmeans_assign): assign every vector to its nearest of 10 seed
    * centroids, then recompute per-cell per-dimension means. Broadcast
    * codebook assign (zero fact shuffle) → posexplode → one partial-
    * aggregated exchange of |cells|×|dims| = 640 rows. Means formed as
    * sum/count and rounded through the shared VARCHAR→DECIMAL route. */
  val v20KmeansUpdate = q("v20_kmeans_update",
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 10),
       |pairs AS (
       |  SELECT e.vec_id, s.cid, e.embedding AS emb,
       |         list_sum(list_transform(generate_series(1, 64),
       |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) -
       |                 CAST(s.ce[CAST(i AS INT)] AS DOUBLE)) ^ 2)) AS dist
       |  FROM embeddings e CROSS JOIN seeds s),
       |assigned AS (
       |  SELECT vec_id, cid, emb FROM (
       |    SELECT vec_id, cid, emb,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY dist ASC, cid ASC) AS rn
       |    FROM pairs) WHERE rn = 1),
       |dims AS (
       |  SELECT a.cid, t.i, CAST(a.emb[CAST(t.i AS INT)] AS DOUBLE) AS x
       |  FROM assigned a CROSS JOIN range(1, 65) t(i))
       |SELECT cid AS centroid_id, i,
       |       ${rnd("sum(x) / count(*)", 6)} AS mean_x,
       |       count(*) AS n_members
       |FROM dims GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val seeds = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val dist = aggregate(zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)
    e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"), col("v"), dist.as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid").as("centroid_id"), (col("pos") + 1).cast("long").as("i"))
      .agg(round(sum("x") / count(lit(1)), 6).as("mean_x"),
        count(lit(1)).as("n_members"))
  }

  /** V21 — MMR diversified re-ranking (Carbonell & Goldstein '98), k=3,
    * λ=0.5: greedily pick the candidate maximizing
    * relevance − λ·max(sim to already-selected). Each greedy stage is a
    * broadcast one-row argmax over the candidate set — relevance and the
    * running selected set are tiny broadcasts, the candidate scan is the
    * only sized input, and k bounds the plan depth (fixed, small). */
  val v21MmrRerank = q("v21_mmr_rerank",
    vecCte + """
      |, cp AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |         sum(a.x * b.x) / (na.nrm * nb.nrm) AS cos
      |  FROM v a JOIN v b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  JOIN norms na ON na.vec_id = a.vec_id
      |  JOIN norms nb ON nb.vec_id = b.vec_id
      |  WHERE a.vec_id <= 99 AND b.vec_id <= 99
      |  GROUP BY 1, 2, na.nrm, nb.nrm),
      |rel AS (SELECT ib AS cid, cos AS rel FROM cp WHERE ia = 0 AND ib >= 1),
      |s1 AS (SELECT cid, rel AS score FROM rel
      |       ORDER BY rel DESC, cid ASC LIMIT 1),
      |sc2 AS (SELECT r.cid, r.rel - 0.5 * c1.cos AS score
      |        FROM rel r
      |        JOIN s1 ON r.cid <> s1.cid
      |        JOIN cp c1 ON c1.ia = s1.cid AND c1.ib = r.cid),
      |s2 AS (SELECT cid, score FROM sc2 ORDER BY score DESC, cid ASC LIMIT 1),
      |sc3 AS (SELECT r.cid,
      |               r.rel - 0.5 * greatest(c1.cos, c2.cos) AS score
      |        FROM rel r
      |        JOIN s1 ON r.cid <> s1.cid
      |        JOIN s2 ON r.cid <> s2.cid
      |        JOIN cp c1 ON c1.ia = s1.cid AND c1.ib = r.cid
      |        JOIN cp c2 ON c2.ia = s2.cid AND c2.ib = r.cid),
      |s3 AS (SELECT cid, score FROM sc3 ORDER BY score DESC, cid ASC LIMIT 1)
      |SELECT * FROM (
      |  SELECT 1 AS rank, cid AS vec_id, CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) AS score FROM s1
      |  UNION ALL
      |  SELECT 2, cid, CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) FROM s2
      |  UNION ALL
      |  SELECT 3, cid, CAST(round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) FROM s3)""".stripMargin) { (s, d) =>
    val e = emb(s, d).where(col("vec_id") <= 99)
      .withColumn("nrm", Similarity.norm(col("v")))
    val q0 = e.where(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val cands = e.where(col("vec_id") >= 1)
      .crossJoin(broadcast(q0))
      .select(col("vec_id").as("cid"), col("v"), col("nrm"),
        (Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .as("rel"))
    def argmax(df: DataFrame, score: Column): DataFrame =
      df.select(col("cid"), col("v"), col("nrm"), score.as("score"))
        .orderBy(col("score").desc, col("cid").asc).limit(1)
    def simTo(tag: String): Column =
      Similarity.dot(col("v"), col(s"${tag}_v")) / (col("nrm") * col(s"${tag}_n"))
    val s1 = argmax(cands, col("rel"))
    val s1b = broadcast(s1.select(col("cid").as("s1_id"), col("v").as("s1_v"),
      col("nrm").as("s1_n")))
    val s2 = argmax(
      cands.crossJoin(s1b).where(col("cid") =!= col("s1_id"))
        .withColumn("score2", col("rel") - lit(0.5) * simTo("s1")),
      col("score2"))
    val s2b = broadcast(s2.select(col("cid").as("s2_id"), col("v").as("s2_v"),
      col("nrm").as("s2_n")))
    val s3 = argmax(
      cands.crossJoin(s1b).crossJoin(s2b)
        .where(col("cid") =!= col("s1_id") && col("cid") =!= col("s2_id"))
        .withColumn("score3",
          col("rel") - lit(0.5) * greatest(simTo("s1"), simTo("s2"))),
      col("score3"))
    def pick(df: DataFrame, r: Int): DataFrame =
      df.select(lit(r).as("rank"), col("cid").as("vec_id"),
        round(col("score"), 3).as("score"))
    pick(s1, 1).unionAll(pick(s2, 2)).unionAll(pick(s3, 3))
  }

  val all: Seq[Q] = Seq(v18RangeSearch, v19SignHamming, v20KmeansUpdate,
    v21MmrRerank)
}
