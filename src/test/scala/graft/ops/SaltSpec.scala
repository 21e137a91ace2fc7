package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSuite {
  import spark.implicits._

  // a skewed dataset: one hot key with 10k rows, 100 cold keys with 10
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toLong)) ++
    (1 to 100).flatMap(k => (1 to 10).map(i => (s"cold$k", i.toLong)))
  ).toDF("k", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salt.saltedAgg(
      skewed.withColumn("n", lit(1L)), "k", buckets = 8,
      partials = Seq("v" -> sum, "n" -> sum), combine = c => sum(col(c)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val dim = (Seq("hot") ++ (1 to 100).map(k => s"cold$k"))
      .zipWithIndex.map { case (k, i) => (k, s"payload$i") }.toDF("k", "p")
    val plain = skewed.join(dim, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Salt.saltedJoin(skewed, dim, "k", buckets = 8)
      .select("k", "v", "p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }
}
