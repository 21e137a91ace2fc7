package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract run per-partition so one task
  * amortizes codec init over a whole batch (the mapInPandas shape, in
  * Scala: mapPartitions over a typed Dataset).
  *
  * The decode step itself is STUBBED (this container ships no media
  * codecs): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. The Spark-side contract — schema, batch shape,
  * partition-level execution, metadata columns — is real and tested;
  * swapping `decodeStub` for a JNI/FFmpeg call changes nothing upstream.
  */
object BinaryOps {

  /** Attach payload metadata: byte length + content hash (scan-side,
    * codegen'd — no shuffle at any scale). */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("content_md5", md5(col(binCol)))

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, features: Array[Float])

  /** Deterministic fake "decode": derives dims + an 8-dim feature vector
    * purely from the bytes. Replace with a real codec behind the same
    * signature. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 64)
    val h = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)) % 64)
    val feats = Array.tabulate(8) { i =>
      if (n == 0) 0f
      else java.lang.Byte.toUnsignedInt(payload(i % n)).toFloat / 255f
    }
    (w, h, feats)
  }

  /** Per-partition decode: one "codec" per partition, streaming rows
    * through it — the batch shape a real decoder needs. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init codec once here, close at exhaustion
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        DecodedRow(r.doc_id, r.payload.length.toLong, w, h, f)
      }
    }
  }

  /** Deterministic fake "resize" of a decoded row to a target box:
    * aspect-preserving integer downscale of the dims + mean-pooling the
    * feature vector in half. Replace with a real resampler behind the
    * same signature. */
  def resizeStub(row: DecodedRow, maxDim: Int): DecodedRow = {
    val scaleNum = math.min(maxDim, math.max(row.width, row.height))
    val scaleDen = math.max(1, math.max(row.width, row.height))
    val w = math.max(1, row.width * scaleNum / scaleDen)
    val h = math.max(1, row.height * scaleNum / scaleDen)
    val pooled = row.features.grouped(2).map(g => g.sum / g.length).toArray
    DecodedRow(row.doc_id, row.n_bytes, w, h, pooled)
  }

  def resize(decoded: Dataset[DecodedRow], maxDim: Int): Dataset[DecodedRow] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map(resizeStub(_, maxDim)))
  }

  final case class VideoRow(doc_id: Long, frames: Array[Array[Byte]])
  final case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Long,
      width: Int, height: Int)

  /** Strided frame sampling + per-frame decode: a "video" is an array of
    * frame payloads; keep frames 0, stride, 2·stride, … and decode only
    * those. Generating the kept indices directly (instead of decoding
    * everything then filtering) is the point — at 100 TB of video the
    * decode cost dominates and must never run on dropped frames. */
  def sampleFrames(video: Dataset[VideoRow], stride: Int): Dataset[FrameRow] = {
    import video.sparkSession.implicits._
    video.flatMap { v =>
      (0 until v.frames.length by stride).iterator.map { i =>
        val payload = v.frames(i)
        val (w, h, _) = decodeStub(payload)
        FrameRow(v.doc_id, i, payload.length.toLong, w, h)
      }
    }
  }
}
