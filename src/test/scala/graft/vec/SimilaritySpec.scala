package graft.vec

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("cosine: 1 for identical, 0 for orthogonal, -1 for opposite") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(
      Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("c"),
      col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k on real embeddings: k rows per query, ranked") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", 4).collect()
    val byQ = top.groupBy(_.getLong(0))
    assert(byQ.size == 3 && byQ.values.forall(_.length == 4))
    byQ.values.foreach { rows =>
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN achieves decent recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, 64,
      planes = 3, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("hot-bucket cap bounds corpus candidates per (tbl, bucket)") {
    // adversarial densification: 400 IDENTICAL vectors all land in the
    // same bucket of every table — uncapped, each query in that bucket
    // sees all 400 as candidates; capped, at most maxBucket per table
    val dims = 8
    val dense = (0L until 400L).map(i => (i, Array.fill(dims)(1.0f)))
      .toDF("vec_id", "embedding")
    val qs = dense.where(col("vec_id") < 2)
    val capped = Similarity.lshTopK(dense, qs, "vec_id", "embedding",
      k = 500, dims = dims, planes = 3, tables = 4, maxBucket = 10)
    // ≤ tables × maxBucket distinct candidates per query (union across
    // tables; here all tables collide on one bucket so ≤ 40, and the
    // md5 rank is id-uniform so > 10 survive the union)
    val perQ = capped.groupBy("query_id").count().collect()
      .map(r => r.getLong(1))
    assert(perQ.forall(_ <= 40), s"cap must bound candidates: ${perQ.toSeq}")
    // cap off (default) is the identical uncapped plan/result
    val qs2 = dense.where(col("vec_id") < 1)
    val off = Similarity.lshTopK(dense, qs2, "vec_id", "embedding",
      k = 500, dims = dims, planes = 3, tables = 2)
    assert(off.count() == 399, "default cap=MaxValue must serve all")
  }

  test("plane weights are deterministic and zero-mean-ish") {
    val ws = (0 until 8).flatMap(p => (0 until 64).map(j => Similarity.planeWeight(0, p, j)))
    assert(ws == (0 until 8).flatMap(p => (0 until 64).map(j => Similarity.planeWeight(0, p, j))))
    assert(math.abs(ws.sum / ws.size) < 1.5)
  }
}
