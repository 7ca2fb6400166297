package graft.ext

/** Pure-JVM RIFF/WAVE codec for uncompressed PCM — a REAL container
  * decode with zero external libraries, closing the multimodal stub
  * one notch: the engine now parses an actual media container
  * byte-for-byte (magic, chunk walk, little-endian header fields,
  * 16-bit sample frames), not a pseudo-feature hash. Only the
  * heavyweight codecs (JPEG/H.264/opus) remain stubbed, because they
  * genuinely need native libraries this environment does not ship.
  *
  * Format handled: canonical RIFF → "WAVE" → chunk sequence with a
  * PCM (audioFormat=1) 16-bit `fmt ` chunk and a `data` chunk; other
  * chunks (LIST, fact, …) are skipped by the walk like any compliant
  * reader. All multi-byte fields are little-endian per the spec.
  */
object Wav {

  final case class Pcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def bitsPerSample: Int = 16
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode 16-bit PCM as a canonical 44-byte-header WAV blob. */
  def encode(pcm: Pcm16): Array[Byte] = {
    val dataLen = pcm.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = pcm.sampleRate * pcm.channels * 2
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(pcm.channels.toShort)
      .putInt(pcm.sampleRate)
      .putInt(byteRate)
      .putShort((pcm.channels * 2).toShort)      // block align
      .putShort(16.toShort)                      // bits per sample
    buf.put("data".getBytes).putInt(dataLen)
    pcm.samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Decode a PCM-16 WAV blob, walking the chunk sequence. Throws a
    * readable IllegalArgumentException on anything that is not a
    * PCM-16 RIFF/WAVE container.
    */
  def decode(bytes: Array[Byte]): Pcm16 = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE container")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[Array[Short]] = None
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      // bound check in LONG arithmetic: a crafted/corrupt size near
      // Int.MaxValue would overflow `off + 8 + size` negative and slip
      // past an Int compare — then OOM on the sample-array alloc or
      // AIOOBE mid-read instead of this readable error
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"truncated $id chunk")
      id match {
        case "fmt " =>
          // fields below read off+8..off+23 — a smaller declared chunk
          // would silently read into the next chunk's bytes
          require(size >= 16, s"fmt chunk too small: $size bytes")
          require(le16(bytes, off + 8) == 1, "only PCM (format 1) supported")
          fmt = Some((le16(bytes, off + 10), le32(bytes, off + 12),
            le16(bytes, off + 22)))
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = le16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
          data = Some(out)
        case _ => // LIST/fact/...: skip, like any compliant reader
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    val (ch, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("missing fmt chunk"))
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    Pcm16(rate, ch, data.getOrElse(
      throw new IllegalArgumentException("missing data chunk")))
  }
}
