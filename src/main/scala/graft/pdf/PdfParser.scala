package graft.pdf

import java.util.zip.Inflater

/** Minimal structural PDF text extractor.
  *
  * The Spark-native analog of the reference's PDF route
  * (`pdf_converter.py` rasterize → OCR, /root/reference/ocr_service/
  * modules/pdf_converter.py:37-113): instead of rasterizing, content
  * streams are lexed directly into positioned glyph runs, which [[XYCut]]
  * clusters into columns/lines (the analog of the `scripts/` column-profile
  * analysis, e.g. scripts/card_column_analysis.py:11-114).
  *
  * Supported: uncompressed and FlateDecode content streams; Tj/TJ/quote
  * show ops; Td, TD, Tm, T-star, TL positioning; literal and hex strings.
  * Caps: ≤ `MaxPages` pages (reference cap, pdf_converter.py:28).
  */
object PdfParser {

  val MaxPages = 20
  val PageBreak = "\n\n--- PAGE BREAK ---\n\n" // processor.py:433-435

  /** `is_pdf` — magic-byte routing (S3, pdf_converter.py:26-34). */
  def isPdf(data: Array[Byte]): Boolean =
    data != null && data.length >= 5 &&
      data(0) == '%' && data(1) == 'P' && data(2) == 'D' &&
      data(3) == 'F' && data(4) == '-'

  final case class GlyphRun(x: Double, y: Double, size: Double, text: String) {
    def width: Double = 0.5 * size * text.length
  }

  /** Extract document text: pages joined with the reference's page-break
    * separator (O6, processor.py:391-438). Returns "" when nothing parses. */
  def extractText(bytes: Array[Byte]): String = {
    val pages = extractPages(bytes)
    pages.mkString(PageBreak)
  }

  def extractPages(bytes: Array[Byte]): List[String] = {
    val streams = findStreams(bytes)
    val pageTexts = List.newBuilder[String]
    var pageCount = 0
    streams.foreach { s =>
      if (pageCount < MaxPages) {
        val runs = interpretContent(s)
        if (runs.nonEmpty) {
          pageTexts += XYCut.layout(runs)
          pageCount += 1
        }
      }
    }
    pageTexts.result()
  }

  // ------------------------------------------------------------------
  // object/stream lexing

  /** Locate stream payloads, decode FlateDecode when flagged, return each
    * as a Latin-1 string (content streams are byte-oriented). */
  private def findStreams(bytes: Array[Byte]): List[String] = {
    if (bytes == null || bytes.length < 16) return Nil
    val doc = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = List.newBuilder[String]
    var from = 0
    var guard = 0
    while (from < doc.length && guard < 10000) {
      guard += 1
      val si = doc.indexOf("stream", from)
      if (si < 0) { from = doc.length }
      else {
        // dict precedes "stream"; find its start for the Filter check
        val dictStart = doc.lastIndexOf("<<", si)
        val dict = if (dictStart >= 0) doc.substring(dictStart, si) else ""
        var dataStart = si + "stream".length
        if (dataStart < doc.length && doc.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
        val ei = doc.indexOf("endstream", dataStart)
        if (ei < 0) { from = doc.length }
        else {
          var dataEnd = ei
          // strip one trailing EOL
          if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val payload =
            if (dict.contains("/FlateDecode")) inflate(raw) else raw
          if (payload != null)
            out += new String(payload,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          from = ei + "endstream".length
        }
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      var total = 0
      while (!inf.finished() && total < (64 << 20)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray
        out.write(buf, 0, n)
        total += n
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => null }
  }

  // ------------------------------------------------------------------
  // content-stream interpreter

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(v: String) extends Tok
  private final case class TName(v: String) extends Tok
  private final case class TOp(v: String) extends Tok
  private case object TArrOpen extends Tok
  private case object TArrClose extends Tok

  private def tokenize(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private var nextTok: Tok = advance()

    private def skipWs(): Unit = {
      var going = true
      while (going && i < s.length) {
        val c = s.charAt(i)
        if (c == '%') { // comment to EOL
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0)
          i += 1
        else going = false
      }
    }

    private def readLiteralString(): String = {
      // s(i) == '('
      i += 1
      val sb = new java.lang.StringBuilder()
      var depth = 1
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val e = s.charAt(i + 1)
          e match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append(v.toChar)
            case other => sb.append(other); i += 2
          }
        } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def readHexString(): String = {
      i += 1 // '<'
      val sb = new java.lang.StringBuilder()
      val hex = new java.lang.StringBuilder()
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (Character.digit(c, 16) >= 0) hex.append(c)
        i += 1
      }
      if (i < s.length) i += 1 // '>'
      if (hex.length() % 2 == 1) hex.append('0')
      var k = 0
      while (k + 1 < hex.length() + 1 && k + 2 <= hex.length()) {
        sb.append(Integer.parseInt(hex.substring(k, k + 2), 16).toChar)
        k += 2
      }
      sb.toString
    }

    private def advance(): Tok = {
      skipWs()
      if (i >= s.length) return null
      val c = s.charAt(i)
      if (c == '(') TStr(readLiteralString())
      else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        i += 2; TOp("<<")
      } else if (c == '<') TStr(readHexString())
      else if (c == '>' && i + 1 < s.length && s.charAt(i + 1) == '>') {
        i += 2; TOp(">>")
      } else if (c == '[') { i += 1; TArrOpen }
      else if (c == ']') { i += 1; TArrClose }
      else if (c == '/') {
        val st = i + 1; i += 1
        while (i < s.length && !isDelim(s.charAt(i))) i += 1
        TName(s.substring(st, i))
      } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val st = i
        i += 1
        while (i < s.length && (s.charAt(i) == '.' ||
          (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
        try TNum(s.substring(st, i).toDouble)
        catch { case _: NumberFormatException => TOp(s.substring(st, i)) }
      } else {
        val st = i
        while (i < s.length && !isDelim(s.charAt(i))) i += 1
        if (i == st) { i += 1; TOp(c.toString) }
        else TOp(s.substring(st, i))
      }
    }

    private def isDelim(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
        c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '/' || c == '%' || c == 0

    def hasNext: Boolean = nextTok != null
    def next(): Tok = { val t = nextTok; nextTok = advance(); t }
  }

  /** Interpret one content stream into positioned glyph runs. */
  private[pdf] def interpretContent(content: String): List[GlyphRun] = {
    if (!content.contains("BT")) return Nil
    val runs = List.newBuilder[GlyphRun]
    var count = 0

    var fontSize = 12.0
    var leading = 14.0
    var lineX = 0.0; var lineY = 0.0
    var curX = 0.0; var curY = 0.0
    // operand stack (numbers/strings since last operator)
    val nums = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastStr: String = null
    val arr = scala.collection.mutable.ArrayBuffer.empty[Either[String, Double]]
    var inArray = false

    def show(text: String): Unit = {
      if (text.nonEmpty && count < 100000) {
        runs += GlyphRun(curX, curY, fontSize, text)
        count += 1
        curX += 0.5 * fontSize * text.length
      }
    }

    val it = tokenize(content)
    while (it.hasNext) {
      it.next() match {
        case TNum(v) =>
          if (inArray) arr += Right(v) else nums += v
        case TStr(v) =>
          if (inArray) arr += Left(v) else lastStr = v
        case TArrOpen => inArray = true; arr.clear()
        case TArrClose => inArray = false
        case TName(_) => // font name etc. — ignored
        case TOp(op) =>
          op match {
            case "Tf" =>
              if (nums.nonEmpty) fontSize = nums.last
            case "TL" =>
              if (nums.nonEmpty) leading = nums.last
            case "Td" =>
              if (nums.size >= 2) {
                lineX += nums(nums.size - 2); lineY += nums.last
                curX = lineX; curY = lineY
              }
            case "TD" =>
              if (nums.size >= 2) {
                leading = -nums.last
                lineX += nums(nums.size - 2); lineY += nums.last
                curX = lineX; curY = lineY
              }
            case "Tm" =>
              // translation components only; glyph scale approximated by Tf
              if (nums.size >= 6) {
                lineX = nums(nums.size - 2); lineY = nums.last
                curX = lineX; curY = lineY
              }
            case "T*" =>
              lineY -= leading; curX = lineX; curY = lineY
            case "BT" =>
              lineX = 0; lineY = 0; curX = 0; curY = 0
            case "ET" => // end text
            case "Tj" =>
              if (lastStr != null) { show(lastStr); lastStr = null }
            case "'" =>
              lineY -= leading; curX = lineX; curY = lineY
              if (lastStr != null) { show(lastStr); lastStr = null }
            case "\"" =>
              lineY -= leading; curX = lineX; curY = lineY
              if (lastStr != null) { show(lastStr); lastStr = null }
            case "TJ" =>
              arr.foreach {
                case Left(s) => show(s)
                case Right(adj) => curX -= adj / 1000.0 * fontSize
              }
              arr.clear()
            case _ => // unknown operator — ignore
          }
          nums.clear()
      }
    }
    runs.result()
  }
}
