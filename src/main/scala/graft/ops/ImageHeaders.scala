package graft.ops

/** Pure-Scala image container codecs for the multimodal column family —
  * REAL formats, not the synthetic stub: PNG (signature + IHDR chunk)
  * and BMP (BITMAPFILEHEADER + BITMAPINFOHEADER). The encoders emit
  * fully valid minimal files (correct CRCs, zlib-stored IDAT, padded
  * 24-bpp pixel rows) with arithmetic-predictable byte lengths, so the
  * DuckDB oracle can recompute `bytes` per media row independently:
  *
  *  - PNG total = 8 (sig) + 25 (IHDR) + 12 + zlen + 12 (IEND), where
  *    zlen = 2 (zlib hdr) + 5 (one stored block ≤ 64 KB) + D + 4
  *    (adler32) and D = h · (1 + 3·w) raw filter+RGB bytes
  *    → total = 68 + h · (1 + 3·w).
  *  - BMP total = 14 + 40 + h · rowSize, rowSize = ((3·w + 3) / 4) · 4.
  *
  * Public-spec formats: PNG per RFC 2083 / ISO 15948, BMP per the
  * Windows BITMAPINFOHEADER layout. Audio/video remain behind the
  * labeled stub in [[MediaCodecStub]] (no codecs in this container).
  */
object ImageHeaders {

  val PngSignature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Does the payload start with the 8-byte PNG signature? */
  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && {
      var i = 0
      while (i < 8 && b(i) == PngSignature(i)) i += 1
      i == 8
    }

  /** BMP magic "BM" + a plausible header length. */
  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** IHDR parse: (width, height, bitDepth) — the IHDR chunk is required
    * to be first (offset 8: length, 12: "IHDR", 16: fields). None when
    * the signature or chunk tag is absent or dimensions are invalid. */
  def decodePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isPng(b) || b.length < 26) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = b(24) & 0xff
    if (w <= 0 || h <= 0) None else Some((w, h, depth))
  }

  /** BITMAPINFOHEADER parse: (width, height, bitsPerPixel). Height may
    * be negative (top-down rows) — reported as its magnitude. */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isBmp(b)) return None
    val w = le32(b, 18)
    val h = le32(b, 22)
    val bpp = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    if (w <= 0 || h == 0) None else Some((w, math.abs(h), bpp))
  }

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def putBe32(bb: java.nio.ByteBuffer, v: Int): Unit = bb.putInt(v)

  /** Minimal VALID 8-bit RGB PNG: IHDR + one stored-mode zlib IDAT
    * (deterministic pixel bytes from `seed`) + IEND. Byte length is
    * exactly 68 + h·(1 + 3·w) — see object doc. */
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val d = h * (1 + 3 * w) // filter byte + RGB per row
    require(d <= 65535, s"stored-block encoder caps one block: $d")
    val raw = new Array[Byte](d)
    var x = seed | 1L
    var p = 0
    var row = 0
    while (row < h) {
      raw(p) = 0 // filter: None
      p += 1
      var c = 0
      while (c < 3 * w) {
        x = x * 6364136223846793005L + 1442695040888963407L
        raw(p) = (x >>> 56).toByte
        p += 1
        c += 1
      }
      row += 1
    }
    // zlib stream: 0x78 0x01 header, one final stored block, adler32
    val adler = { val a = new java.util.zip.Adler32(); a.update(raw); a.getValue }
    val z = java.nio.ByteBuffer.allocate(2 + 5 + d + 4)
    z.put(0x78.toByte).put(0x01.toByte)
    z.put(0x01.toByte) // BFINAL=1, BTYPE=00 (stored)
    z.put((d & 0xff).toByte).put(((d >> 8) & 0xff).toByte)
    z.put(((d ^ 0xffff) & 0xff).toByte).put((((d ^ 0xffff) >> 8) & 0xff).toByte)
    z.put(raw)
    z.putInt(adler.toInt)
    val idat = z.array()

    val ihdrBody = java.nio.ByteBuffer.allocate(13)
    putBe32(ihdrBody, w); putBe32(ihdrBody, h)
    ihdrBody.put(8.toByte)  // bit depth
    ihdrBody.put(2.toByte)  // color type: truecolor RGB
    ihdrBody.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/none/none

    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length + 12)
    out.put(PngSignature)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.putInt(body.length)
      val t = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.put(t).put(body)
      out.putInt(crc32(t, body))
    }
    chunk("IHDR", ihdrBody.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.array()
  }

  /** Minimal valid bottom-up 24-bpp BMP with deterministic pixels.
    * Byte length is exactly 54 + h·((3·w + 3)/4·4). */
  def encodeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val dataSize = h * rowSize
    val total = 54 + dataSize
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(total)
    bb.putShort(0).putShort(0)
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(w)
    bb.putInt(h)
    bb.putShort(1)  // planes
    bb.putShort(24) // bpp
    bb.putInt(0)    // BI_RGB
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835) // 72 dpi
    bb.putInt(0).putInt(0)
    var x = seed | 1L
    var i = 0
    while (i < dataSize) {
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
      i += 1
    }
    bb.array()
  }
}
