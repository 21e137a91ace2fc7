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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (brute force).
    * Returns (query_id, neighbor_id, cos) — cos rounded to 3dp, ranking by
    * (rounded cos desc, neighbor id asc) so results are reproducible
    * across engines and FP summation orders. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("cv"))
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 3))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Deterministic pseudorandom hyperplane weight for (plane, dim):
    * hex digit of md5("plane:<p>:<block>") minus 7.5 — zero-mean, exactly
    * representable in double, reproducible in any engine with md5. */
  def planeWeight(p: Int, j: Int): Double = {
    val block = j / 32
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$block".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString
    Integer.parseInt(hex.charAt(j % 32).toString, 16) - 7.5
  }

  /** Sign-bit signature over `planes` hyperplanes → LongType bucket id. */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column = {
    (0 until planes).map { p =>
      val ws = (0 until dims).map(planeWeight(p, _))
      val proj = aggregate(
        zip_with(vec, lit(ws.toArray), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN via hyperplane-LSH buckets: exact cosine, but only within the
    * query's bucket — the 100 TB-scale path (bucket groupBy, no cross
    * join). Recall tunes with `planes` (fewer planes → bigger buckets). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, dims: Int, planes: Int): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), asDouble(col(vec)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), dims, planes))
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dims, planes))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 3))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
