package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (3L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("typed Aggregator signature equals the batch min() computation") {
    val agg = new MinHashAgg(8).toColumn
    val viaAgg = docs
      .select(col("doc_id"), explode(NearDup.shingles(col("text"), 3)).as("sh"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("sig"))
      .collect().toMap
      .map { case (id, sig) => id -> sig.toSeq }

    val viaBatch = NearDup.withMinhashSignature(docs, "doc_id", col("text"), 3, 8)
      .collect()
      .map(r => r.getLong(0) -> (0 until 8).map(i => r.getString(i + 1)))
      .toMap

    assert(viaAgg == viaBatch)
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val a = new MinHashAgg(4)
    val s1 = Seq("x y z", "a b c", "m n o")
    val fwd = s1.foldLeft(a.zero.clone())(a.reduce)
    val split = a.merge(
      s1.take(1).foldLeft(a.zero.clone())(a.reduce),
      s1.drop(1).foldLeft(a.zero.clone())(a.reduce))
    assert(fwd.toSeq == split.toSeq)
  }
}
