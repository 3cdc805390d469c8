package graft.multimodal

/** Minimal RIFF/WAVE PCM container: a canonical writer plus a chunk-walking
  * parser — the REAL container-header decode path for the audio family
  * (r12: replaces the r11 per-byte sample-count stub).
  *
  * The parser is deliberately not a "44-byte struct cast": it walks the
  * RIFF chunk list (4-byte tag + little-endian u32 size, word-aligned — odd
  * chunk bodies carry a pad byte per the RIFF spec), so containers with
  * extra chunks (LIST/INFO metadata, fact chunks) parse exactly like
  * canonical ones, and truncation or a size field pointing past the buffer
  * returns None instead of tearing. Everything is fixed-offset byte
  * arithmetic — deterministic, no codec library, exactly the layer a real
  * decoder handle would sit behind.
  */
object RiffWav extends Serializable {

  /** Parsed fmt+data header state. `nSamples` is `dataBytes / blockAlign`
    * (a ragged trailing partial frame is dropped, as real decoders do). */
  final case class WavMeta(
      audioFormat: Int, channels: Int, sampleRate: Int,
      byteRate: Int, blockAlign: Int, bitsPerSample: Int,
      dataBytes: Long, nSamples: Long)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Canonical 44-byte-header PCM WAV: RIFF(WAVE) → fmt(16, PCM) → data. */
  def encode(sampleRate: Int, bitsPerSample: Int, channels: Int,
             data: Array[Byte]): Array[Byte] = {
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0 && channels > 0)
    val blockAlign = channels * (bitsPerSample / 8)
    val byteRate = sampleRate * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    tag("RIFF"); out.write(le32(36L + data.length)); tag("WAVE")
    tag("fmt "); out.write(le32(16L))
    out.write(le16(1)) // PCM
    out.write(le16(channels)); out.write(le32(sampleRate.toLong))
    out.write(le32(byteRate.toLong)); out.write(le16(blockAlign))
    out.write(le16(bitsPerSample))
    tag("data"); out.write(le32(data.length.toLong)); out.write(data)
    out.toByteArray
  }

  /** Chunk-walking parse. None on: buffer shorter than the RIFF preamble,
    * bad RIFF/WAVE magic, a chunk size running past the buffer, an
    * undersized fmt chunk, or a missing fmt /data chunk. */
  /** The data chunk's body bytes (pad excluded): None on bad magic,
    * missing data chunk, or a size field overrunning the buffer — the
    * same chunk walk as [[parse]], returning the PCM payload itself
    * (r12c3, q_mm_audio_energy's sample decode). */
  def dataPayload(bytes: Array[Byte]): Option[Array[Byte]] = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = u32(off + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None
      if (id == "data")
        return Some(java.util.Arrays.copyOfRange(bytes, body, body + sz.toInt))
      off = body + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  def parse(bytes: Array[Byte]): Option[WavMeta] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")

    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int, Int)] = None
    var dataLen = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(off)
      val sz = u32(off + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None // declared size overruns buffer
      if (id == "fmt ") {
        if (sz < 16) return None
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt,
          u32(body + 8).toInt, u16(body + 12), u16(body + 14)))
      } else if (id == "data") dataLen = sz
      off = body + sz.toInt + (sz.toInt & 1) // RIFF word alignment pad
    }
    fmt match {
      case Some((af, ch, rate, br, ba, bps)) if dataLen >= 0 =>
        Some(WavMeta(af, ch, rate, br, ba, bps, dataLen,
          if (ba > 0) dataLen / ba else 0L))
      case _ => None
    }
  }
}
