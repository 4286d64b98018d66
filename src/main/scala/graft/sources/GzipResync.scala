package graft.sources

import java.io.InputStream
import java.util.zip.{CRC32, DataFormatException, Inflater}

/** Gzip reader for member-per-record archives (the Common-Crawl WARC
  * layout) that survives corruption: where `java.util.zip.GZIPInputStream`
  * throws on the first bad byte — losing the REST of a ~1 GB crawl file
  * and failing the Spark task — this stream abandons the damaged member
  * and resyncs to the next `1f 8b 08` member signature, so one flipped
  * byte costs one record, not a file.
  *
  * Partial bytes already inflated from a member that later turns out
  * corrupt HAVE been emitted downstream; the WARC layer's own resync
  * (`Warc.syncToVersionLine` + content-length framing) discards the torn
  * record, which is why this stream does not need to buffer whole
  * members. A member whose trailer CRC mismatches is structurally
  * complete — its bytes are likewise left to the WARC layer to validate.
  *
  * Also reads ordinary single-member `.gz` files (a concatenation of one)
  * and tolerates trailing garbage after the last member.
  */
private[sources] final class GzipMemberResyncStream(raw: InputStream,
    basePos: Long = 0L, startAtSignature: Boolean = false)
    extends InputStream {

  private val buf = new Array[Byte](1 << 16)
  private var bufPos = 0
  private var bufLen = 0
  private var rawEof = false

  private val inf = new Inflater(true) // nowrap: we frame members ourselves
  private val crc = new CRC32
  private var inMember = false
  private var finished = false // no more members will ever arrive

  /** Members skipped (header malformed, deflate error, or truncated). */
  private[sources] var corruptMembers: Int = 0

  /** Total raw bytes pulled from `raw` so far (position accounting for
    * sub-file splits — see [[memberStartPos]]). */
  private var rawConsumed: Long = 0L

  /** Raw-file offset of the `1f 8b 08` signature of the member being
    * (or last) decoded, absolute when `basePos` carries the split
    * offset the caller seeked to. −1 until the first member starts. The
    * split reader uses it as the record's container-unit position: a
    * gzip-membered WARC is splittable exactly at member boundaries. */
  private[sources] var memberStartPos: Long = -1L

  // ------------------------------------------------------------ raw input

  /** Ensure at least one unread byte is buffered; false at raw EOF. */
  private def fill(): Boolean = {
    while (bufPos >= bufLen) {
      if (rawEof) return false
      bufPos = 0
      bufLen = raw.read(buf)
      if (bufLen < 0) { bufLen = 0; rawEof = true; return false }
      rawConsumed += bufLen
    }
    true
  }

  /** Next raw byte as 0-255, or -1 at EOF. */
  private def readByte(): Int =
    if (fill()) { val b = buf(bufPos) & 0xff; bufPos += 1; b } else -1

  /** Skip exactly n raw bytes; false if EOF intervenes. */
  private def skipBytes(n: Int): Boolean = {
    var left = n
    while (left > 0) {
      if (!fill()) return false
      val take = math.min(left, bufLen - bufPos)
      bufPos += take; left -= take
    }
    true
  }

  // --------------------------------------------------------- member frame

  /** Set between an abandoned/torn member and the next found signature,
    * so the garbage remnant of an already-counted member is not counted
    * a second time by startMember's skipped-bytes check. */
  // startAtSignature: the stream begins mid-member (a sub-file split
  // seeked to an arbitrary offset) — scan to the first signature
  // without counting the skipped bytes as corruption
  private var resyncing = startAtSignature

  /** Parse one gzip member header, assuming magic+CM already consumed.
    * False on malformation or EOF (caller resyncs). */
  private def readHeaderAfterMagic(): Boolean = {
    val flg = readByte()
    if (flg < 0 || (flg & 0xe0) != 0) return false // reserved bits set
    if (!skipBytes(6)) return false                // MTIME + XFL + OS
    if ((flg & 4) != 0) {                          // FEXTRA
      val x0 = readByte(); val x1 = readByte()
      if (x1 < 0) return false
      if (!skipBytes(x0 | (x1 << 8))) return false
    }
    if ((flg & 8) != 0) {                          // FNAME, zero-terminated
      var b = readByte()
      while (b > 0) b = readByte()
      if (b < 0) return false
    }
    if ((flg & 16) != 0) {                         // FCOMMENT
      var b = readByte()
      while (b > 0) b = readByte()
      if (b < 0) return false
    }
    if ((flg & 2) != 0 && !skipBytes(2)) return false // FHCRC
    true
  }

  /** Position at the start of the next member's deflate data by sliding
    * a 3-byte window over the raw stream until the `1f 8b 08` signature
    * (degenerately, the very next 3 bytes — the well-formed
    * concatenation case). Byte-at-a-time sliding is what guarantees a
    * valid member is never skipped when preceding garbage happens to
    * end in `1f` or `1f 8b` (a consumed-lookahead scan would eat the
    * real signature's first bytes). Counts one corruption event when
    * garbage preceded a FOUND member; benign trailing garbage at EOF is
    * not counted. False when no member remains. */
  private def startMember(): Boolean = {
    while (true) {
      var b0 = readByte(); if (b0 < 0) return false
      var b1 = readByte(); if (b1 < 0) return false
      var b2 = readByte(); if (b2 < 0) return false
      var skipped = 0
      while (!(b0 == 0x1f && b1 == 0x8b && b2 == 0x08)) {
        skipped += 1
        b0 = b1; b1 = b2; b2 = readByte()
        if (b2 < 0) return false // trailing garbage, no member follows
      }
      if (skipped > 0 && !resyncing) corruptMembers += 1
      resyncing = false
      // signature bytes b0 b1 b2 are already consumed: the member began
      // 3 bytes before the current unread-buffer position
      memberStartPos = basePos + rawConsumed - (bufLen - bufPos) - 3
      if (readHeaderAfterMagic()) {
        inf.reset(); crc.reset(); inMember = true
        return true
      }
      corruptMembers += 1 // torn header; keep scanning
      resyncing = true
    }
    false // unreachable
  }

  /** Consume the 8-byte trailer. CRC/ISIZE mismatch is deliberately NOT a
    * resync (the deflate stream was structurally complete; the WARC layer
    * owns content validation) — but it is counted. */
  private def finishMember(): Unit = {
    // hand unconsumed inflater lookahead back to the buffer
    bufPos -= inf.getRemaining
    var trailerCrc = 0L
    var i = 0
    var ok = true
    while (i < 4) { val b = readByte(); if (b < 0) ok = false else trailerCrc |= (b.toLong << (8 * i)); i += 1 }
    if (!skipBytes(4)) ok = false // ISIZE (mod 2^32) — not validated
    if (!ok || trailerCrc != crc.getValue) corruptMembers += 1
    inMember = false
  }

  /** Abandon the current member (deflate error): hand the inflater's
    * unconsumed lookahead back and let the next read() resume member
    * discovery (startMember scans to the next signature). */
  private def abandonMember(): Unit = {
    bufPos -= inf.getRemaining
    corruptMembers += 1
    resyncing = true
    inMember = false
  }

  // ------------------------------------------------------------- contract

  private val one = new Array[Byte](1)
  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (!finished) {
      if (!inMember) {
        if (!startMember()) { finished = true; return -1 }
      }
      if (inf.finished()) finishMember()
      else {
        if (inf.needsInput()) {
          if (!fill()) { // member truncated at raw EOF
            corruptMembers += 1; finished = true; return -1
          }
          inf.setInput(buf, bufPos, bufLen - bufPos)
          bufPos = bufLen // consumed up-front; remainder restored via getRemaining
        }
        try {
          val n = inf.inflate(out, off, len)
          if (n > 0) { crc.update(out, off, n); return n }
          // n == 0 and not finished and not needsInput cannot persist;
          // loop re-checks finished()/needsInput()
        } catch {
          case _: DataFormatException => abandonMember()
        }
      }
    }
    -1
  }

  override def available(): Int = if (finished) 0 else 1

  override def close(): Unit = {
    inf.end()
    raw.close()
  }
}

/** Lenient wrapper over the zstd decoder: a mid-stream IOException
  * (flipped byte, inter-frame garbage, dictionary-compressed frame
  * without its dictionary) ENDS the file's stream instead of failing
  * the Spark task — the WARC module's never-throws contract. Unlike
  * gzip there is no per-member resync (zstd-jni owns the frame walk),
  * so corruption truncates the file at that point; `aborted` records
  * that it happened for the per-file health view. */
private[sources] final class ZstdLenientStream(zst: InputStream)
    extends InputStream {

  private var done = false
  private[sources] var aborted = false

  private val one = new Array[Byte](1)
  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    if (done) return -1
    try {
      val n = zst.read(out, off, len)
      if (n < 0) done = true
      n
    } catch {
      case _: java.io.IOException => aborted = true; done = true; -1
    }
  }

  override def available(): Int = if (done) 0 else 1

  override def close(): Unit = zst.close()
}
