package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity search over an `array<float>` embedding column.
  *
  * Two paths:
  *  - brute-force cosine top-k (exact baseline): query×corpus cross join;
  *    correct at any k, O(Q·N) — fine when Q is small or N fits a
  *    broadcast;
  *  - LSH-bucketed ANN (scale path): random-hyperplane signatures computed
  *    scan-side; candidate generation is a groupBy on the signature —
  *    turns 100 TB × query into a bucket-local search. Hyperplanes are
  *    derived deterministically from md5 so every engine (and every run)
  *    agrees.
  *
  * All arithmetic in double (exact widening from float), sequential
  * left-fold summation (Catalyst `aggregate`) for reproducibility.
  */
object Similarity {

  /** embedding cast to array<double> for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — a native codegen Expression
    * (graft.functions.VecDot): a primitive double loop inside
    * whole-stage codegen, vs the higher-order-function form which
    * allocates a zipped array and evaluates a Catalyst lambda per
    * element. Same summation order, bit-identical results. */
  def dot(a: Column, b: Column): Column = graft.functions.VecOps.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (brute force).
    * Returns (query_id, neighbor_id, cos) — cos rounded to 3dp, ranking by
    * (rounded cos desc, neighbor id asc) so results are reproducible
    * across engines and FP summation orders.
    *
    * Norms are computed ONCE per vector on each side before the join —
    * per-pair work is exactly one dot product. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Deterministic pseudorandom hyperplane weight for (table, plane, dim):
    * hex digit of md5("plane:<t>:<p>:<block>") minus 7.5 — zero-mean,
    * exactly representable in double, reproducible in any engine with md5. */
  def planeWeight(t: Int, p: Int, j: Int): Double = {
    val block = j / 32
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$t:$p:$block".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString
    Integer.parseInt(hex.charAt(j % 32).toString, 16) - 7.5
  }

  /** Sign-bit signature over `planes` hyperplanes → LongType bucket id
    * for one hash table. */
  def lshBucket(vec: Column, dims: Int, planes: Int, table: Int): Column = {
    (0 until planes).map { p =>
      val ws = (0 until dims).map(planeWeight(table, p, _))
      val proj = dot(vec, lit(ws.toArray))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** One (table, bucket) struct per hash table for a vector. */
  private def lshBuckets(vec: Column, dims: Int, planes: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("tbl"), lshBucket(vec, dims, planes, t).as("bucket"))): _*)

  /** ANN via multi-table hyperplane LSH: candidates = union of the
    * query's buckets across `tables` hash tables, then exact cosine
    * re-rank. The 100 TB-scale path — a groupBy-shaped join on
    * (table, bucket) instead of a cross join; recall tunes with
    * planes (bucket size) × tables (independent chances).
    *
    * `maxBucket` is the HOT-BUCKET CAP, the ANN twin of
    * [[graft.text.NearDup.lshCandidatesFromSigs]]'s: candidate volume is
    * Σ(queries-in-bucket × corpus-in-bucket), so a degenerate bucket —
    * constant/zero embeddings, boilerplate vectors — makes the
    * (tbl, bucket) join quadratic in that bucket's population. The cap
    * keeps at most `maxBucket` CORPUS members per (tbl, bucket), chosen
    * by a DETERMINISTIC md5 rank of (tbl, id) — unbiased w.r.t. id
    * order, reproducible across runs/engines, and table-dependent so
    * each hash table samples a DIFFERENT subset of an oversized cluster
    * (union coverage across tables). Applied via row_number on the same
    * (tbl, bucket) hash partitioning the candidate join needs — Catalyst
    * reuses the exchange — so an adversarial 10M-member bucket costs
    * O(tables · maxBucket · queries) candidates instead of an OOM.
    * Query-side membership is never capped: every query still probes all
    * its buckets; only how many corpus candidates a saturated bucket may
    * nominate is bounded. Default Int.MaxValue = off (hash-stable with
    * the uncapped battery entries). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, dims: Int, planes: Int, tables: Int = 4,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    def explodeBuckets(df: DataFrame, idAs: String, vecAs: String, nrmAs: String) =
      df.select(col(id).as(idAs), asDouble(col(vec)).as(vecAs))
        .withColumn(nrmAs, norm(col(vecAs)))
        .withColumn("tb", explode(lshBuckets(col(vecAs), dims, planes, tables)))
        .select(col(idAs), col(vecAs), col(nrmAs),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val c0 = explodeBuckets(corpus, "neighbor_id", "cv", "cn")
    val c =
      if (maxBucket == Int.MaxValue) c0
      else c0.withColumn("__rk", row_number().over(
          Window.partitionBy(col("tbl"), col("bucket"))
            .orderBy(md5(concat(col("tbl").cast("string"), lit(":cap:"),
              col("neighbor_id").cast("string"))), col("neighbor_id"))))
        .where(col("__rk") <= maxBucket).drop("__rk")
    val q = explodeBuckets(queries, "query_id", "qv", "qn")
    val cands = q.join(c, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cos",
      round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
