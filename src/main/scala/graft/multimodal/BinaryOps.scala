package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract run per-partition so one task
  * amortizes codec init over a whole batch (the mapInPandas shape, in
  * Scala: mapPartitions over a typed Dataset).
  *
  * Image decode is REAL for the JVM's built-in codecs (PNG/BMP/GIF/JPEG
  * via `javax.imageio`, see [[BinaryOps.decodeImage]] — exercised
  * end-to-end by the m9_png_roundtrip battery query on genuine encoded
  * pixels). Video/audio codecs don't ship in this container, so those
  * payloads fall back to `decodeStub`, a deterministic fake; the
  * Spark-side contract — schema, batch shape, partition-level execution,
  * metadata columns — is identical either way, so swapping the stub for
  * a JNI/FFmpeg call changes nothing upstream.
  */
object BinaryOps {

  /** ImageIO defaults to DISK-backed stream caches: every read/write
    * creates (and fsync-deletes) a temp file, which serializes 32
    * concurrent codec tasks on filesystem churn — measured m12 going
    * 1.1 s (serial) → 2.7 s (parallel!) before this. All payloads here
    * are in-memory byte arrays; cache in memory. Idempotent JVM-global. */
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decode for the formats the JVM ships codecs for (PNG,
    * BMP, GIF, JPEG via `javax.imageio` — no native deps): returns
    * width/height and an 8-dim feature vector of genuine pixel statistics
    * (mean R/G/B, mean luma, and the four quadrant lumas — a tiny but
    * honest "embedding"). None for payloads that aren't a decodable
    * image, so callers can fall back to [[decodeStub]] for the synthetic
    * non-image payloads in the test tables. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.length < 8) return None
    val png = (payload(0) & 0xFF) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G'
    val bmp = payload(0) == 'B' && payload(1) == 'M'
    val gif = payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F'
    val jpg = (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8
    if (!png && !bmp && !gif && !jpg) return None
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        val quadLuma = new Array[Long](4)
        val quadN = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            rs += r; gs += g; bs += b
            val qi = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            quadLuma(qi) += (r + g + b) / 3; quadN(qi) += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        val feats = Array(
          rs / n / 255f, gs / n / 255f, bs / n / 255f,
          (rs + gs + bs) / (3 * n) / 255f,
          quadLuma(0) / math.max(1L, quadN(0)).toFloat / 255f,
          quadLuma(1) / math.max(1L, quadN(1)).toFloat / 255f,
          quadLuma(2) / math.max(1L, quadN(2)).toFloat / 255f,
          quadLuma(3) / math.max(1L, quadN(3)).toFloat / 255f)
        (w, h, feats)
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Decode an in-memory image payload through `javax.imageio` with the
    * memory-cache discipline above (referencing this object from the
    * decode lambda also guarantees the `setUseCache(false)` init has run
    * in the executor JVM — a bare `ImageIO.read` in a closure would not).
    * Null when the payload is not decodable, like `ImageIO.read`. */
  def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))

  /** PNG encode (real `javax.imageio` codec): renders `pixel(x, y)` →
    * packed 0xRRGGBB into a PNG byte payload. Used to fixture genuine
    * image columns from deterministic content. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-partition decode: one "codec" per partition, streaming rows
    * through it — the batch shape a real decoder needs. Real image
    * payloads (PNG/BMP/GIF/JPEG) go through the genuine `javax.imageio`
    * decode; anything else falls back to the deterministic stub. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl for exotic codecs: init here, close at exhaustion
      rows.map { r =>
        val (w, h, f) = decodeImage(r.payload).getOrElse(decodeStub(r.payload))
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
