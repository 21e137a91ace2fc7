package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BinaryOpsSpec extends SparkSuite {
  import spark.implicits._

  test("binary metadata: byte length + md5 over a real binary column") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val meta = BinaryOps.withMeta(df, "payload").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[String]("content_md5"))).toMap
    assert(meta(1L)._1 == 5L)
    assert(meta(1L)._2 == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(meta(2L)._1 == 0L)
  }

  test("per-partition decode: deterministic stub, schema survives") {
    val media = Seq(
      BinaryOps.MediaRow(1L, Array[Byte](10, 20, 30)),
      BinaryOps.MediaRow(2L, Array.emptyByteArray)).toDS()
    val out = BinaryOps.decode(media).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 16 + 10 % 64 && out(1L).height == 16 + 20 % 64)
    assert(out(1L).features.length == 8)
    assert(out(2L).n_bytes == 0L && out(2L).features.forall(_ == 0f))
    // determinism: same input → same features
    val again = BinaryOps.decode(media).collect().map(d => d.doc_id -> d.features.toSeq).toMap
    assert(again(1L) == out(1L).features.toSeq)
  }
}
