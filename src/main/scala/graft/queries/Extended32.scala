package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 32: real-codec multimodal operators — now that
  * image decode is genuine (`javax.imageio`, see m9_png_roundtrip), the
  * perceptual-hash dedup runs on actually-decoded pixels; and the audio
  * modality gets the same treatment through the JVM's built-in WAV codec
  * (`javax.sound.sampled`).
  */
object Extended32 {

  /** M10 — perceptual hash (aHash) near-dup on REAL decoded pixels: each
    * document renders a 16×16 grayscale PNG (content class = doc_id mod
    * 97, plus a per-doc global brightness shift), is decoded back through
    * `javax.imageio`, mean-pooled 2×2 into an 8×8 luma grid, and each
    * cell's sum is thresholded against the global mean to give a 64-bit
    * aHash — exact integer comparisons throughout (cell_sum·64 vs
    * total_sum), so the hash is bit-reproducible in SQL. The aHash is
    * invariant to the brightness shift BY CONSTRUCTION (both sides of the
    * threshold shift equally: cell_sum·64 and total both gain 256·c), so
    * same-class docs collapse to the same hash even though their payload
    * bytes differ — exactly the robustness property perceptual hashing
    * buys over md5 (m1's content hash). The oracle hashes the UNSHIFTED
    * content; Spark hashes the decoded shifted pixels as-is — the hashes
    * can only match because the invariance actually holds. Emitted as two
    * unsigned 32-bit halves in BIGINT (no sign-bit games cross-engine),
    * with the exact-phash duplicate count per doc.
    *
    * Scale: decode + hash are scan-side per-partition; the dup count is
    * one groupBy on the 8-byte hash — the m-family analog of d1's exact
    * dedup, downstream of a real codec. */
  val m10PhashNeardup = q("m10_phash_neardup",
    """WITH px AS (
      |  SELECT d.doc_id, x.x, y.y,
      |         (x.x * 7 + y.y * 13 + d.doc_id % 97) % 251 AS g
      |  FROM documents d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)),
      |cells AS (
      |  SELECT doc_id, y // 2 AS by, x // 2 AS bx, sum(g) AS cs
      |  FROM px GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(cs) AS ts FROM cells GROUP BY 1),
      |bits AS (
      |  SELECT c.doc_id, c.by, c.bx,
      |         CASE WHEN c.cs * 64 > t.ts THEN 1 ELSE 0 END AS b
      |  FROM cells c JOIN tot t ON c.doc_id = t.doc_id),
      |ph AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN by < 4 THEN CAST(b AS BIGINT) << (by * 8 + bx) END) AS BIGINT) AS phash_hi,
      |         CAST(sum(CASE WHEN by >= 4 THEN CAST(b AS BIGINT) << ((by - 4) * 8 + bx) END) AS BIGINT) AS phash_lo
      |  FROM bits GROUP BY 1),
      |dup AS (
      |  SELECT phash_hi, phash_lo, count(*) AS n FROM ph GROUP BY 1, 2)
      |SELECT p.doc_id, p.phash_hi, p.phash_lo,
      |       CAST(d.n - 1 AS BIGINT) AS n_same_phash
      |FROM ph p JOIN dup d USING (phash_hi, phash_lo)""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.BinaryOps
    val hashes = docIds(s, d)
      .mapPartitions { ids =>
        ids.map { id =>
          val g0 = (id % 97).toInt
          val shift = (id % 5).toInt // brightness variant: must not change aHash
          // content capped at 250 so +shift (<=4) never wraps — wrap would
          // break the uniform-shift premise the invariance rests on
          val png = BinaryOps.encodePng(16, 16, (x, y) => {
            val g = (x * 7 + y * 13 + g0) % 251 + shift
            (g << 16) | (g << 8) | g
          })
          val img = BinaryOps.readImage(png)
          require(img != null, s"PNG for doc $id failed to decode")
          // 2x2 mean-pool via exact cell sums of decoded (still-shifted) luma
          val cells = Array.ofDim[Long](8, 8)
          var total = 0L
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val luma = img.getRGB(x, y) & 0xFF // r=g=b by construction
              cells(y / 2)(x / 2) += luma
              total += luma
              x += 1
            }
            y += 1
          }
          var hi = 0L; var lo = 0L
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              if (cells(by)(bx) * 64 > total) {
                if (by < 4) hi |= 1L << (by * 8 + bx)
                else lo |= 1L << ((by - 4) * 8 + bx)
              }
              bx += 1
            }
            by += 1
          }
          (id, hi, lo)
        }
      }.toDF("doc_id", "phash_hi", "phash_lo")
    // dup count as a whole-partition window over the hash: the groupBy +
    // self-join form re-ran the codec mapPartitions on BOTH join sides
    // (two full encode+decode passes) and paid two exchanges; the window
    // is one exchange and one codec pass (guide §2.4: share one exchange)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("phash_hi", "phash_lo")
    hashes
      .withColumn("n", count(lit(1)).over(w))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        (col("n") - 1).cast("long").as("n_same_phash"))
  }

  /** M11 — real WAV audio round-trip: each document synthesizes a mono
    * 8-bit PCM WAV payload (RIFF container written byte-by-byte; samples
    * are a closed-form function of (doc_id, t)), which is then parsed and
    * decoded by the JVM's genuine audio codec
    * (`javax.sound.sampled.AudioSystem`) — format, frame count and the
    * raw samples all come from the decoder, not the generator. The hashed
    * output is the decoded frame count, sample rate, and exact per-window
    * (64-sample) sums, reproduced arithmetically by the oracle: a single
    * mis-parsed header field or sample breaks the hash. This promotes the
    * audio modality from "synthetic windows over a fake signal"
    * (m3_audio_windows) to a real container decode.
    *
    * Scale: payloads are built and decoded scan-side per partition and
    * never shuffled — only the (doc, window) sums leave the executor;
    * identical shape to production audio featurization where the STFT
    * runs next to the bytes. */
  val m11WavRoundtrip = q("m11_wav_roundtrip",
    """WITH t AS (
      |  SELECT d.doc_id, 256 + d.doc_id % 64 AS n, s.t
      |  FROM documents d, generate_series(0, 319) s(t)
      |  WHERE s.t < 256 + d.doc_id % 64),
      |w AS (
      |  SELECT doc_id, CAST(n AS BIGINT) AS n_samples, t // 64 AS win,
      |         (t * 13 + doc_id * 7) % 256 AS sample
      |  FROM t)
      |SELECT doc_id, n_samples, CAST(8000 AS INT) AS sample_rate,
      |       CAST(win AS INT) AS win,
      |       CAST(sum(sample) AS BIGINT) AS w_sum
      |FROM w GROUP BY 1, 2, 4""".stripMargin) { (s, d) =>
    import s.implicits._
    docIds(s, d) // single-row-group input: repartition or the WAV codec runs serial
      .flatMap { id =>
        val n = (256 + id % 64).toInt
        val data = Array.tabulate[Byte](n)(t => ((t * 13 + id * 7) % 256).toByte)
        val wav = graft.multimodal.AudioOps.encodeWav8(data, sampleRate = 8000)
        val (rate, samples) = graft.multimodal.AudioOps.decodeWav8(wav)
        // windowed sums via index arithmetic: the zipWithIndex.groupBy
        // form allocated a tuple per sample and a HashMap per row —
        // pure overhead for fixed 64-sample windows
        val nw = (samples.length + 63) / 64
        val sums = new Array[Long](nw)
        var i = 0
        while (i < samples.length) { sums(i / 64) += samples(i); i += 1 }
        (0 until nw).map(w => (id, samples.length.toLong, rate, w, sums(w)))
      }
      .toDF("doc_id", "n_samples", "sample_rate", "win", "w_sum")
  }

  val all: Seq[Q] = Seq(m10PhashNeardup, m11WavRoundtrip)
}
