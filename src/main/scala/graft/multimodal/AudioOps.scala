package graft.multimodal

/** Real audio-container codec for the one format the JVM ships a parser
  * for: PCM WAV via `javax.sound.sampled.AudioSystem` (no native deps —
  * the audio sibling of [[BinaryOps.decodeImage]]'s `javax.imageio`
  * path). Encode writes the RIFF/fmt/data chunks byte-by-byte; decode
  * goes through the genuine `AudioInputStream` parser, so header fields
  * (rate, channels, sample size) and the frames themselves come from the
  * codec, not from trusting the generator.
  */
object AudioOps {

  /** Encode unsigned 8-bit mono PCM samples as a WAV payload. */
  def encodeWav8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate = rate * channels * bytesPerSample
      .putShort(1) // block align
      .putShort(8) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(n).put(samples)
    bb.array()
  }

  /** Decode a WAV payload through `AudioSystem`; returns (sampleRate,
    * unsigned sample values 0–255). Throws on non-WAV or non-8-bit-mono
    * payloads — callers that mix modalities should sniff first. */
  def decodeWav8(payload: Array[Byte]): (Int, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"expected 8-bit mono PCM, got $fmt")
      val n = ais.getFrameLength.toInt
      val raw = ais.readNBytes(n)
      (fmt.getSampleRate.toInt, raw.map(b => java.lang.Byte.toUnsignedInt(b)))
    } finally ais.close()
  }
}
