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

  test("real PNG decode: encode -> decodeImage round-trips dims and pixel stats") {
    // 4x2 image: left half black, right half white
    val png = BinaryOps.encodePng(4, 2, (x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val (w, h, feats) = BinaryOps.decodeImage(png).get
    assert(w == 4 && h == 2)
    assert(math.abs(feats(0) - 0.5f) < 1e-6) // mean R: half 0, half 255/255
    assert(math.abs(feats(3) - 0.5f) < 1e-6) // mean luma
    assert(feats(4) == 0f && feats(5) == 1f) // top-left quad black, top-right white
    // non-image payloads are rejected, not mis-decoded
    assert(BinaryOps.decodeImage(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    assert(BinaryOps.decodeImage("BMnotreallyabitmap".getBytes).isEmpty)
    // decode() routes real images through the codec (not the stub)
    val media = Seq(BinaryOps.MediaRow(1L, png)).toDS()
    val out = BinaryOps.decode(media).collect().head
    assert(out.width == 4 && out.height == 2 && out.n_bytes == png.length.toLong)
  }

  test("resize: aspect-preserving downscale + pooled features") {
    val media = Seq(BinaryOps.MediaRow(1L, Array[Byte](100, 40, 7))).toDS()
    val dec = BinaryOps.decode(media)
    val out = BinaryOps.resize(dec, maxDim = 32).collect().head
    val in = dec.collect().head
    // in: w = 16+100%64 = 52, h = 16+40%64 = 56 → scaled into 32 box
    assert(in.width == 52 && in.height == 56)
    assert(out.width == 52 * 32 / 56 && out.height == 32)
    assert(out.features.length == 4)
    assert(math.abs(out.features(0) - (in.features(0) + in.features(1)) / 2) < 1e-6)
    // no upscale: already-small stays put
    val small = BinaryOps.resize(dec, maxDim = 1000).collect().head
    assert(small.width == in.width && small.height == in.height)
  }

  test("frame sampling decodes only kept frames, preserves indices") {
    val frames = Array.tabulate(7)(i => Array[Byte](i.toByte, (i * 2).toByte))
    val video = Seq(BinaryOps.VideoRow(9L, frames)).toDS()
    val out = BinaryOps.sampleFrames(video, stride = 3).collect()
      .sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(out.forall(_.doc_id == 9L))
    assert(out(1).width == 16 + 3 % 64 && out(1).height == 16 + 6 % 64)
  }
}
