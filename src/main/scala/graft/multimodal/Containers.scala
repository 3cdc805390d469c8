package graft.multimodal

/** Minimal BMP and AVI containers — with [[RiffWav]], the real
  * container-header decode layer for all three media kinds (r12): a
  * canonical writer plus a fixed-offset little-endian parser per format,
  * refusal (None) on truncation/bad magic/overrunning size fields. No
  * codec library; exactly the byte arithmetic a real decoder handle
  * fronts. */
private[multimodal] object LE {
  def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")
}

/** Windows BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (≥40). */
object Bmp extends Serializable {
  import LE._

  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
      dataOffset: Long, dataBytes: Long)

  /** Canonical 54-byte-header 24bpp BMP around an opaque pixel payload
    * (payload length is NOT required to equal the row-stride product —
    * header parsing, not pixel decoding, is the contract here). */
  def encode(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(54 + data.length)
    out.write('B'); out.write('M')
    out.write(le32(54L + data.length)) // file size
    out.write(le32(0L)) // reserved
    out.write(le32(54L)) // pixel data offset
    out.write(le32(40L)) // biSize
    out.write(le32(width.toLong)); out.write(le32(height.toLong))
    out.write(le16(1)) // planes
    out.write(le16(24)) // bpp
    out.write(le32(0L)) // BI_RGB
    out.write(le32(data.length.toLong)) // biSizeImage
    out.write(le32(2835L)); out.write(le32(2835L)) // 72 DPI
    out.write(le32(0L)); out.write(le32(0L)) // palette
    out.write(data)
    out.toByteArray
  }

  /** None on: shorter than the two headers, bad 'BM' magic, an info
    * header shorter than BITMAPINFOHEADER, or a pixel-data offset past
    * the buffer. */
  def parse(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val off = u32(bytes, 10)
    val biSize = u32(bytes, 14)
    if (biSize < 40 || off > bytes.length || off < 54) return None
    Some(BmpMeta(i32(bytes, 18), i32(bytes, 22), u16(bytes, 28),
      off, bytes.length - off))
  }
}

/** AVI-lite: RIFF('AVI ') → LIST('hdrl') → 'avih' main header → the
  * fields a frame sampler needs. Same RIFF chunk-walk discipline as
  * [[RiffWav]] (word alignment, overrun refusal), one level deeper: the
  * avih chunk lives INSIDE a LIST. */
object AviLite extends Serializable {
  import LE._

  final case class AviMeta(usPerFrame: Long, totalFrames: Long,
      width: Int, height: Int)

  /** Canonical writer: RIFF(AVI ) [ LIST(hdrl)[avih(56)] LIST(movi)[00dc
    * payload] ]. */
  def encode(usPerFrame: Long, totalFrames: Long, width: Int, height: Int,
      movi: Array[Byte]): Array[Byte] = {
    val avih = new java.io.ByteArrayOutputStream()
    avih.write(le32(usPerFrame)); avih.write(le32(0L)); avih.write(le32(0L))
    avih.write(le32(0L)); avih.write(le32(totalFrames)); avih.write(le32(0L))
    avih.write(le32(1L)); avih.write(le32(0L))
    avih.write(le32(width.toLong)); avih.write(le32(height.toLong))
    avih.write(le32(0L)); avih.write(le32(0L)); avih.write(le32(0L))
    avih.write(le32(0L)) // 56-byte main header
    val a = avih.toByteArray

    val hdrl = "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(a.length.toLong) ++ a
    val moviPay = movi ++ (if (movi.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val moviList = "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(movi.length.toLong) ++ moviPay
    val body = "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(hdrl.length.toLong) ++ hdrl ++
      "LIST".getBytes("US-ASCII") ++ le32(moviList.length.toLong) ++ moviList
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** The movi payload (the first 00dc chunk's body, pad byte excluded):
    * None on bad magic, no 00dc in ANY LIST(movi), or any size field
    * overrunning the buffer — the same chunk walk as [[parse]], one
    * level down the DATA side. Foreign top-level and movi-level chunks
    * skip with the RIFF odd-size pad rule (r12c3, q_mm_video_keyframes).
    * A LIST(movi) WITHOUT a 00dc falls through to the outer walk (r13,
    * the advisor note): a real RIFF walker keeps scanning for a later
    * movi list — committing to the first one was stricter than the
    * top-level foreign-chunk discipline this parser already follows. */
  def moviPayload(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = u32(bytes, off + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None
      if (id == "LIST" && sz >= 4 && tag(bytes, body) == "movi") {
        var in = body + 4
        val end = body + sz.toInt
        while (in + 8 <= end) {
          val cid = tag(bytes, in)
          val csz = u32(bytes, in + 4)
          val cbody = in + 8
          if (cbody + csz > end) return None
          if (cid == "00dc")
            return Some(java.util.Arrays.copyOfRange(
              bytes, cbody, cbody + csz.toInt))
          in = cbody + csz.toInt + (csz.toInt & 1)
        }
        // movi list without a 00dc: keep walking — a later LIST(movi)
        // may carry the stream data
      }
      off = body + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** None on: bad RIFF/'AVI ' magic, no LIST(hdrl), no avih inside it,
    * an avih shorter than 40 bytes, or any size field overrunning the
    * buffer. Foreign top-level and hdrl-level chunks are skipped with
    * the RIFF pad rule. */
  def parse(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = u32(bytes, off + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None
      if (id == "LIST" && sz >= 4 && tag(bytes, body) == "hdrl") {
        var in = body + 4
        val end = body + sz.toInt
        while (in + 8 <= end) {
          val cid = tag(bytes, in)
          val csz = u32(bytes, in + 4)
          val cbody = in + 8
          if (cbody + csz > end) return None
          if (cid == "avih") {
            if (csz < 40) return None
            return Some(AviMeta(u32(bytes, cbody), u32(bytes, cbody + 16),
              i32(bytes, cbody + 32), i32(bytes, cbody + 36)))
          }
          in = cbody + csz.toInt + (csz.toInt & 1)
        }
        return None // hdrl without avih
      }
      off = body + sz.toInt + (sz.toInt & 1)
    }
    None
  }
}
