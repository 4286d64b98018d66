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
  * Supported: uncompressed, FlateDecode, LZWDecode, ASCIIHexDecode,
  * ASCII85Decode and RunLengthDecode content streams (and filter
  * ARRAYS, applied first-to-last); Tj/TJ/quote show ops; Td, TD, Tm,
  * T-star, TL positioning; literal and hex strings.
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

  /** Page texts. Page boundaries come from the page tree (Catalog →
    * Pages → Kids): a page whose /Contents is an ARRAY of streams is one
    * page, not several (stream-order counting got this wrong). Falls back
    * to stream-order when no page tree parses (truncated/malformed docs).
    * 2-byte CID hex strings (Type0/Identity-H docs) are mapped through
    * the ToUnicode CMap when present; unmapped codes become U+FFFD
    * instead of garbage. */
  def extractPages(bytes: Array[Byte]): List[String] = {
    val objs = parseObjects(bytes)
    val cidDoc = objs.values.exists(o =>
      o.dict.contains("/Type0") || o.dict.contains("/Identity-H"))
    val toUni = if (cidDoc) parseToUnicode(objs) else Map.empty[Int, String]
    val docFonts = parseFontEncodings(objs)
    val pageContents = pageContentStreamsWithIds(objs)
    // font tables are scoped PER PAGE (a page's /Resources may bind /F1
    // to a simple font while another page's /F1 is a Type0 CID font —
    // a document-wide first-binding-wins table would byte-decode that
    // page's 2-byte CID strings into mojibake); pages without their own
    // /Resources (inherited) fall back to the document-wide table
    val sources: List[(String, Map[String, Array[String]])] =
      if (pageContents.nonEmpty)
        pageContents.map { case (num, s) =>
          (s, pageFontEncodings(objs, num).getOrElse(docFonts))
        }
      else findStreams(bytes).map((_, docFonts)) // legacy stream order
    val pageTexts = List.newBuilder[String]
    var pageCount = 0
    sources.foreach { case (s, fonts) =>
      if (pageCount < MaxPages) {
        val runs = interpretContent(s, cidDoc, toUni, fonts)
        if (runs.nonEmpty) {
          pageTexts += XYCut.layout(runs)
          pageCount += 1
        }
      }
    }
    pageTexts.result()
  }

  // ------------------------------------------------------------------
  // object table + page tree

  private[pdf] final case class PdfObj(dict: String, stream: Option[String])

  private val objHeader =
    java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b")
  private val refPattern =
    java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R\\b")

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Indirect objects: number → (dict text, decoded stream payload).
    *
    * The scanner resumes AFTER each object's endstream/endobj, so byte
    * sequences that happen to spell "N 0 obj" inside binary stream
    * payloads can never create phantom objects (which used to overwrite
    * real entries and corrupt page-tree order in compressed PDFs). The
    * 10000-object guard is logged when it truncates — never a silent
    * cap. */
  private[pdf] def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    if (bytes == null || bytes.length < 16) return Map.empty
    val doc = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = Map.newBuilder[Int, PdfObj]
    val m = objHeader.matcher(doc)
    var guard = 0
    var from = 0
    while (from < doc.length && m.find(from) && guard < 10000) {
      guard += 1
      val num = m.group(1).toInt
      val bodyStart = m.end()
      val endObj = doc.indexOf("endobj", bodyStart)
      val bodyEnd = if (endObj < 0) doc.length else endObj
      val si = doc.indexOf("stream", bodyStart)
      if (si >= 0 && si < bodyEnd) {
        val dict = doc.substring(bodyStart, si)
        var dataStart = si + "stream".length
        if (dataStart < doc.length && doc.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
        val ei = doc.indexOf("endstream", dataStart)
        if (ei >= 0) {
          var dataEnd = ei
          if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && doc.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val payload = decodeStream(dict, raw)
          out += num -> PdfObj(dict,
            Option(payload).map(p =>
              new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)))
          // skip past the stream payload: its bytes must never be
          // scanned for object headers
          val eo = doc.indexOf("endobj", ei)
          from = if (eo >= 0) eo + "endobj".length else ei + "endstream".length
        } else {
          out += num -> PdfObj(dict, None)
          from = doc.length // unterminated stream: nothing trustworthy after
        }
      } else {
        out += num -> PdfObj(doc.substring(bodyStart, bodyEnd), None)
        from = if (endObj >= 0) endObj + "endobj".length else bodyEnd
      }
      if (from <= bodyStart) from = bodyStart // monotone progress
    }
    if (guard >= 10000 && from < doc.length && m.find(from))
      log.warn(s"parseObjects: 10000-object guard truncated the scan " +
        s"(${doc.length} bytes; objects beyond offset $from were dropped)")
    val base = out.result()
    // PDF 1.5+ object streams: /Type /ObjStm payloads hold N compressed
    // objects (page/font/encoding dicts of most modern PDFs). Unpack
    // them into the object table; a top-level object with the same
    // number wins (incremental updates append uncompressed overrides).
    val unpacked = base.values
      .filter(o => o.dict.contains("/ObjStm") && o.stream.isDefined)
      .flatMap(o => unpackObjStm(o))
      .filterNot { case (num, _) => base.contains(num) }
    if (unpacked.isEmpty) base else base ++ unpacked
  }

  private val intToken = java.util.regex.Pattern.compile("\\d+")

  private def intAfter(dict: String, key: String): Int = {
    val i = dict.indexOf(key)
    if (i < 0) return -1
    val m = intToken.matcher(dict)
    if (m.find(i + key.length)) m.group().toInt else -1
  }

  /** Embedded (objNum → dict) pairs of one /ObjStm payload: header is
    * N (objnum, offset) integer pairs, bodies start at /First. Objects
    * inside an ObjStm are dict-only (the spec forbids nested streams). */
  private[pdf] def unpackObjStm(o: PdfObj): List[(Int, PdfObj)] = {
    val s = o.stream.getOrElse(return Nil)
    val n = intAfter(o.dict, "/N")
    val first = intAfter(o.dict, "/First")
    if (n <= 0 || n > 10000 || first <= 0 || first > s.length) return Nil
    val m = intToken.matcher(s.substring(0, first))
    val header = new Array[Int](2 * n)
    var i = 0
    while (i < 2 * n && m.find()) {
      header(i) =
        try m.group().toInt
        catch { case _: NumberFormatException => return Nil }
      i += 1
    }
    if (i < 2 * n) return Nil
    val out = List.newBuilder[(Int, PdfObj)]
    var k = 0
    while (k < n) {
      val num = header(2 * k)
      val start = first + header(2 * k + 1)
      val end =
        if (k + 1 < n) math.min(s.length, first + header(2 * k + 3))
        else s.length
      if (start >= 0 && start <= end)
        out += num -> PdfObj(s.substring(start, end), None)
      k += 1
    }
    out.result()
  }

  private def refsIn(s: String): List[Int] = {
    val m = refPattern.matcher(s)
    val b = List.newBuilder[Int]
    while (m.find()) b += m.group(1).toInt
    b.result()
  }

  private def dictValue(dict: String, key: String): Option[String] = {
    val i = dict.indexOf(key)
    if (i < 0) return None
    // up to the next key or dict end — enough for refs/arrays
    var j = i + key.length
    var depth = 0
    val sb = new java.lang.StringBuilder()
    var done = false
    while (j < dict.length && !done) {
      val c = dict.charAt(j)
      if (c == '[') { depth += 1; sb.append(c); j += 1 }
      else if (c == ']') {
        depth -= 1; sb.append(c); j += 1
        if (depth == 0) done = true
      }
      else if (c == '/' && depth == 0 && sb.length() > 0) done = true
      else if (c == '>' && depth == 0) done = true
      else { sb.append(c); j += 1 }
    }
    Some(sb.toString)
  }

  private val typePage =
    java.util.regex.Pattern.compile("/Type\\s*/Page(?![a-zA-Z])")
  private val typePages =
    java.util.regex.Pattern.compile("/Type\\s*/Pages(?![a-zA-Z])")

  /** One concatenated content-stream text per page, in page-tree order. */
  private[pdf] def pageContentStreams(objs: Map[Int, PdfObj]): List[String] =
    pageContentStreamsWithIds(objs).map(_._2)

  /** (page object number, concatenated content) per page, page-tree
    * order — the id lets the caller resolve per-page /Resources. */
  private[pdf] def pageContentStreamsWithIds(
      objs: Map[Int, PdfObj]): List[(Int, String)] = {
    if (objs.isEmpty) return Nil
    // roots: /Pages nodes not referenced as a Kid of another /Pages node
    val pagesNodes = objs.filter(o => typePages.matcher(o._2.dict).find())
    val pageObjs = objs.filter(o => typePage.matcher(o._2.dict).find())
    if (pageObjs.isEmpty) return Nil

    val kidRefs: Map[Int, List[Int]] = pagesNodes.map { case (n, o) =>
      n -> dictValue(o.dict, "/Kids").map(refsIn).getOrElse(Nil)
    }
    val allKids = kidRefs.values.flatten.toSet
    val roots = pagesNodes.keys.filterNot(allKids.contains).toList.sorted

    val ordered = List.newBuilder[Int]
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(n: Int, depth: Int): Unit = {
      if (depth > 32 || seen.contains(n)) return
      seen += n
      if (pageObjs.contains(n)) ordered += n
      else kidRefs.getOrElse(n, Nil).foreach(walk(_, depth + 1))
    }
    roots.foreach(walk(_, 0))
    // pages outside any discovered tree (orphan Page objects): append in
    // object order so malformed docs still extract
    pageObjs.keys.toList.sorted.foreach(n =>
      if (!seen.contains(n)) ordered += n)

    ordered.result().flatMap { n =>
      val contents = dictValue(pageObjs(n).dict, "/Contents")
        .map(refsIn).getOrElse(Nil)
      val parts = contents.flatMap(objs.get).flatMap(_.stream)
      if (parts.isEmpty) None else Some((n, parts.mkString("\n")))
    }
  }

  // ------------------------------------------------------------------
  // simple-font /Encoding tables (WinAnsi/MacRoman + /Differences)

  private val fontEntry =
    java.util.regex.Pattern.compile("/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R")
  private val encodingName =
    java.util.regex.Pattern.compile("/(WinAnsiEncoding|MacRomanEncoding|StandardEncoding|PDFDocEncoding)")
  private val diffToken =
    java.util.regex.Pattern.compile("(\\d+)|/([^\\s/<>\\[\\]()]+)")

  /** Balanced `<< ... >>` substring starting at `start` (which must point
    * at the opening `<<`); empty when unbalanced. */
  private def balancedDict(s: String, start: Int): String = {
    var depth = 0
    var i = start
    while (i < s.length - 1) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      }
      else i += 1
    }
    ""
  }

  /** Decode table from an /Encoding value: a base-encoding name, or a
    * dict (inline or via `ref`) with /BaseEncoding + /Differences. */
  private def encodingTable(objs: Map[Int, PdfObj],
      fontDict: String): Option[Array[String]] = {
    val i = fontDict.indexOf("/Encoding")
    if (i < 0) return None
    var j = i + "/Encoding".length
    while (j < fontDict.length && Character.isWhitespace(fontDict.charAt(j))) j += 1
    val encSrc: String =
      if (j + 1 < fontDict.length && fontDict.charAt(j) == '<' &&
        fontDict.charAt(j + 1) == '<')
        balancedDict(fontDict, j) // inline dict
      else {
        val tail = fontDict.substring(j, math.min(fontDict.length, j + 40))
        val rm = refPattern.matcher(tail)
        if (rm.lookingAt) // indirect encoding dict
          objs.get(rm.group(1).toInt).map(_.dict).getOrElse("")
        else tail // a bare name like /WinAnsiEncoding
      }
    if (encSrc.isEmpty) return None
    val base = {
      val bm = encodingName.matcher(encSrc)
      if (bm.find()) PdfEncodings.baseTable(bm.group(1)) else PdfEncodings.Identity
    }
    val di = encSrc.indexOf("/Differences")
    if (di < 0) {
      if (base eq PdfEncodings.Identity) None else Some(base)
    } else {
      val lb = encSrc.indexOf('[', di)
      val rb = if (lb < 0) -1 else encSrc.indexOf(']', lb)
      if (lb < 0 || rb < 0) return Some(base)
      val dm = diffToken.matcher(encSrc.substring(lb + 1, rb))
      val diffs = List.newBuilder[(Int, String)]
      var code = 0
      while (dm.find()) {
        if (dm.group(1) != null) code = dm.group(1).toInt
        else { diffs += ((code, dm.group(2))); code += 1 }
      }
      Some(PdfEncodings.withDifferences(base, diffs.result()))
    }
  }

  /** Resolve the value following `key` in `src` as a dict: inline
    * `<< ... >>` or an indirect reference to one; "" when neither. */
  private def dictAfterKey(objs: Map[Int, PdfObj], src: String,
      keyEnd: Int): String = {
    var j = keyEnd
    while (j < src.length && Character.isWhitespace(src.charAt(j))) j += 1
    if (j + 1 < src.length && src.charAt(j) == '<' && src.charAt(j + 1) == '<')
      balancedDict(src, j)
    else {
      val tail = src.substring(j, math.min(src.length, j + 40))
      val rm = refPattern.matcher(tail)
      if (rm.lookingAt) objs.get(rm.group(1).toInt).map(_.dict).getOrElse("")
      else ""
    }
  }

  /** Scan `src` for /Font blocks (inline or indirect) and collect
    * name → decode table for non-CID fonts declaring an /Encoding.
    * First binding per name wins within `src`. */
  private def fontsInDict(objs: Map[Int, PdfObj], src: String,
      out: scala.collection.mutable.LinkedHashMap[String, Array[String]])
      : Unit = {
    var fi = src.indexOf("/Font")
    while (fi >= 0) {
      // "/FontDescriptor"/"/FontFile" never parse as a dict-or-ref value
      val block = dictAfterKey(objs, src, fi + "/Font".length)
      val em = fontEntry.matcher(block)
      while (em.find()) {
        val name = em.group(1)
        if (!out.contains(name)) {
          objs.get(em.group(2).toInt).foreach { fontObj =>
            if (!fontObj.dict.contains("/Type0")) // CID handled via CMap
              encodingTable(objs, fontObj.dict).foreach(out(name) = _)
          }
        }
      }
      fi = src.indexOf("/Font", fi + 5)
    }
  }

  /** Document-wide map: font resource name (the /F1 of `Tf`) → 256-entry
    * byte decode table, for non-CID fonts that declare an /Encoding.
    * First binding per name wins. Used as the FALLBACK for pages without
    * their own /Resources (inherited resources) and for the legacy
    * stream-order path — pages that do declare /Resources get a
    * page-scoped table from [[pageFontEncodings]] instead, so one page's
    * simple-font /F1 can never shadow another page's Type0 /F1. */
  private[pdf] def parseFontEncodings(
      objs: Map[Int, PdfObj]): Map[String, Array[String]] = {
    if (!objs.values.exists(_.dict.contains("/Encoding"))) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Array[String]]
    objs.toSeq.sortBy(_._1).foreach { case (_, o) =>
      fontsInDict(objs, o.dict, out)
    }
    out.toMap
  }

  /** Page-scoped font tables from the page object's own /Resources
    * (inline or indirect); None when the page declares none (resources
    * inherited from an ancestor /Pages node — caller falls back to the
    * document-wide table). */
  private[pdf] def pageFontEncodings(objs: Map[Int, PdfObj],
      pageNum: Int): Option[Map[String, Array[String]]] = {
    val dict = objs.get(pageNum).map(_.dict).getOrElse("")
    val ri = dict.indexOf("/Resources")
    if (ri < 0) return None
    val resSrc = dictAfterKey(objs, dict, ri + "/Resources".length)
    if (resSrc.isEmpty) return None
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Array[String]]
    fontsInDict(objs, resSrc, out)
    Some(out.toMap)
  }

  // ------------------------------------------------------------------
  // ToUnicode CMaps (bfchar/bfrange), merged document-wide

  private val hexPair = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>")
  private val hexTriple = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>")
  private val hexSingle = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>")
  private val hexArrayRange = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*\\[((?:\\s*<[0-9a-fA-F]+>)+)\\s*\\]")

  private def utf16beOfHex(hex: String): String = {
    val sb = new java.lang.StringBuilder(hex.length / 4 + 1)
    var k = 0
    while (k + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(k, k + 4), 16).toChar)
      k += 4
    }
    if (k < hex.length) // odd tail: best-effort single byte
      sb.append(Integer.parseInt(hex.substring(k), 16).toChar)
    sb.toString
  }

  /** Merge every ToUnicode CMap in the document: CID code → string. */
  private[pdf] def parseToUnicode(objs: Map[Int, PdfObj]): Map[Int, String] = {
    val out = scala.collection.mutable.HashMap.empty[Int, String]
    objs.values.flatMap(_.stream).foreach { s =>
      if (s.contains("begincmap") || s.contains("beginbfchar") ||
          s.contains("beginbfrange")) {
        // bfchar sections: <src> <dst>
        var i = 0
        while ({ i = s.indexOf("beginbfchar", i); i >= 0 }) {
          val end = s.indexOf("endbfchar", i)
          val section = if (end < 0) s.substring(i) else s.substring(i, end)
          val m = hexPair.matcher(section)
          while (m.find() && out.size < 65536)
            out(Integer.parseInt(m.group(1), 16)) = utf16beOfHex(m.group(2))
          i = if (end < 0) s.length else end + 1
        }
        // bfrange sections: <lo> <hi> <dstStart>, or the array form
        // <lo> <hi> [<d1> <d2> ...] (one dst per code)
        i = 0
        while ({ i = s.indexOf("beginbfrange", i); i >= 0 }) {
          val end = s.indexOf("endbfrange", i)
          val rawSection = if (end < 0) s.substring(i) else s.substring(i, end)
          // array form first; matches are removed so the triple matcher
          // can't misalign across an array's elements
          val am = hexArrayRange.matcher(rawSection)
          val sb = new java.lang.StringBuilder()
          var last = 0
          while (am.find() && out.size < 65536) {
            sb.append(rawSection, last, am.start())
            last = am.end()
            val lo = Integer.parseInt(am.group(1), 16)
            val dm = hexSingle.matcher(am.group(3))
            var c = lo
            val hi = Integer.parseInt(am.group(2), 16)
            while (dm.find() && c <= hi && out.size < 65536) {
              out(c) = utf16beOfHex(dm.group(1))
              c += 1
            }
          }
          sb.append(rawSection, last, rawSection.length)
          val section = sb.toString
          val m = hexTriple.matcher(section)
          while (m.find() && out.size < 65536) {
            val lo = Integer.parseInt(m.group(1), 16)
            val hi = math.min(Integer.parseInt(m.group(2), 16), lo + 65535)
            val dst = utf16beOfHex(m.group(3))
            var c = lo
            while (c <= hi && out.size < 65536) {
              val shifted =
                if (dst.isEmpty) ""
                else dst.substring(0, dst.length - 1) +
                  (dst.charAt(dst.length - 1) + (c - lo)).toChar
              out(c) = shifted
              c += 1
            }
          }
          i = if (end < 0) s.length else end + 1
        }
      }
    }
    out.toMap
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
        // dict precedes "stream"; find its start for the Filter check —
        // nesting-aware (a plain lastIndexOf("<<") would land on a
        // nested sub-dict like /DecodeParms << ... >> and lose /Filter)
        val dictStart = dictStartBefore(doc, si)
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
          val payload = decodeStream(dict, raw)
          if (payload != null)
            out += new String(payload,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          from = ei + "endstream".length
        }
      }
    }
    out.result()
  }

  /** Start index of the outermost `<<` of the dict whose closing `>>`
    * immediately precedes position `si` — a backward scan balancing
    * `>>`/`<<` pairs, so nested sub-dicts (/DecodeParms << ... >>)
    * don't truncate the enclosing stream dict. −1 when absent. The
    * scan is windowed to 8 KB: real stream dicts are far smaller, and
    * without the bound a malformed doc repeating `stream` with no
    * dicts costs O(len) per token — quadratic over the document
    * (bounded-work contract; the old lastIndexOf had the same hole). */
  private def dictStartBefore(doc: String, si: Int): Int = {
    val floor = math.max(0, si - 8192)
    var i = si - 1
    var depth = 0
    while (i > floor) {
      val c = doc.charAt(i)
      if (c == '>' && doc.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else if (c == '<' && doc.charAt(i - 1) == '<') {
        depth -= 1
        if (depth <= 0) return i - 1
        i -= 2
      }
      else i -= 1
    }
    -1
  }

  // ------------------------------------------------------------------
  // stream filters (PDF 32000-1 §7.4): FlateDecode, LZWDecode,
  // ASCIIHexDecode, ASCII85Decode, RunLengthDecode — including filter
  // ARRAYS (applied first-to-last) and /DecodeParms predictors (TIFF
  // predictor 2 and PNG predictors 10–15, §7.4.4.4) applied after the
  // Flate/LZW stage they parameterize. Predicted ObjStm/content
  // streams (Flate + /Predictor 12 occurs in the wild) now decode;
  // image filters (DCTDecode etc.) and indirect /Filter refs still
  // leave the data as-is (the text interpreter gates on "BT").

  private val filterNameToken =
    java.util.regex.Pattern.compile("/([A-Za-z0-9]+)")

  /** Filter names in application order; Nil when the stream declares
    * none (or an unsupported indirect /Filter reference). */
  private[pdf] def filtersOf(dict: String): List[String] = {
    var fi = dict.indexOf("/Filter")
    while (fi >= 0) {
      var j = fi + "/Filter".length
      while (j < dict.length && Character.isWhitespace(dict.charAt(j))) j += 1
      if (j < dict.length && dict.charAt(j) == '[') {
        val rb = dict.indexOf(']', j)
        val body = if (rb < 0) dict.substring(j + 1) else dict.substring(j + 1, rb)
        val m = filterNameToken.matcher(body)
        val b = List.newBuilder[String]
        while (m.find()) b += m.group(1)
        return b.result()
      } else if (j < dict.length && dict.charAt(j) == '/') {
        val m = filterNameToken.matcher(dict)
        if (m.find(j)) return List(m.group(1))
      }
      // "/FilterXyz" or a ref — try a later occurrence
      fi = dict.indexOf("/Filter", fi + 7)
    }
    Nil
  }

  /** Apply the stream's declared filter chain; null on corrupt data
    * (caller treats as undecodable). Unknown filters pass data through
    * unchanged (image codecs never reach the text interpreter — it
    * gates on "BT"). /DecodeParms predictors (>1) are un-applied right
    * after the Flate/LZW stage they parameterize; a predictor this
    * decoder can't invert yields null rather than predictor-encoded
    * garbage flowing into the content interpreter. */
  private[pdf] def decodeStream(dict: String, raw: Array[Byte]): Array[Byte] = {
    var data = raw
    val parms = decodeParmsOf(dict)
    var idx = 0
    filtersOf(dict).foreach { f =>
      if (data != null) {
        val predicted = f match {
          case "FlateDecode" | "Fl" => inflate(data)
          case "LZWDecode" | "LZW" => lzwDecode(data)
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
          case "ASCII85Decode" | "A85" => ascii85Decode(data)
          case "RunLengthDecode" | "RL" => runLengthDecode(data)
          case _ => data
        }
        data = f match {
          case "FlateDecode" | "Fl" | "LZWDecode" | "LZW" =>
            applyPredictor(parms(idx), predicted)
          case _ => predicted
        }
      }
      idx += 1
    }
    data
  }

  /** Predictor parameters of one /DecodeParms entry (spec defaults:
    * Predictor 1, Colors 1, BitsPerComponent 8, Columns 1). */
  private[pdf] final case class PredictorParms(
      predictor: Int, colors: Int, bpc: Int, columns: Int)

  private val intEntryToken =
    java.util.regex.Pattern.compile("/(Predictor|Colors|BitsPerComponent|Columns)\\s+(\\d+)")

  private def parseParmsDict(body: String): PredictorParms = {
    var pred = 1; var colors = 1; var bpc = 8; var columns = 1
    val m = intEntryToken.matcher(body)
    while (m.find()) {
      val v = m.group(2).toInt
      m.group(1) match {
        case "Predictor" => pred = v
        case "Colors" => colors = v
        case "BitsPerComponent" => bpc = v
        case "Columns" => columns = v
      }
    }
    PredictorParms(pred, colors, bpc, columns)
  }

  /** /DecodeParms (or abbreviated /DP) entries as an index-aligned view
    * over the filter chain: a single dict parameterizes filter 0, an
    * array of dicts/nulls aligns positionally (§7.3.8.2). Returns the
    * identity parms when absent — every index is total. */
  private[pdf] def decodeParmsOf(dict: String): Int => PredictorParms = {
    val none = PredictorParms(1, 1, 8, 1)
    var pi = dict.indexOf("/DecodeParms")
    var keyLen = "/DecodeParms".length
    if (pi < 0) { pi = dict.indexOf("/DP"); keyLen = "/DP".length }
    if (pi < 0) return _ => none
    var j = pi + keyLen
    while (j < dict.length && Character.isWhitespace(dict.charAt(j))) j += 1
    if (j + 1 < dict.length && dict.charAt(j) == '<' && dict.charAt(j + 1) == '<') {
      val end = dict.indexOf(">>", j)
      val body = if (end < 0) dict.substring(j) else dict.substring(j, end)
      val p = parseParmsDict(body)
      i => if (i == 0) p else none
    } else if (j < dict.length && dict.charAt(j) == '[') {
      // array of << dict >> | null, positional per filter
      val rb = dict.indexOf(']', j)
      val body = if (rb < 0) dict.substring(j + 1) else dict.substring(j + 1, rb)
      val out = List.newBuilder[PredictorParms]
      var k = 0
      while (k < body.length) {
        if (body.startsWith("<<", k)) {
          val end = body.indexOf(">>", k)
          val dictBody = if (end < 0) body.substring(k) else body.substring(k, end)
          out += parseParmsDict(dictBody)
          k = if (end < 0) body.length else end + 2
        } else if (body.startsWith("null", k)) { out += none; k += 4 }
        else k += 1
      }
      val arr = out.result().toArray
      i => if (i >= 0 && i < arr.length) arr(i) else none
    } else _ => none // indirect ref or malformed — treat as no predictor
  }

  /** Invert the declared predictor (§7.4.4.4). Predictor 1 is identity;
    * 2 is TIFF horizontal differencing (8-bit components only here —
    * sub-byte TIFF differencing yields null/undecodable rather than
    * garbage); 10–15 are the PNG row filters, where each row carries
    * its own tag byte (the /Predictor value ≥10 only signals "PNG
    * predictors in use"). Malformed geometry → null. */
  private[pdf] def applyPredictor(p: PredictorParms,
      data: Array[Byte]): Array[Byte] = {
    if (data == null || p.predictor <= 1) return data
    val rowLen = (p.columns * p.colors * p.bpc + 7) / 8
    if (rowLen <= 0) return null
    val bpp = math.max(1, (p.colors * p.bpc + 7) / 8)
    if (p.predictor == 2) {
      if (p.bpc != 8) return null
      if (data.length % rowLen != 0) return null
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = r + bpp
        val end = r + rowLen
        while (i < end) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
        r += rowLen
      }
      out
    } else if (p.predictor >= 10 && p.predictor <= 15) {
      if (data.length % (rowLen + 1) != 0) return null
      val rows = data.length / (rowLen + 1)
      val out = new Array[Byte](rows.toLong.toInt * rowLen)
      val prev = new Array[Byte](rowLen) // row above, zeros for row 0
      var r = 0
      while (r < rows) {
        val tag = data(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var i = 0
        tag match {
          case 0 => // None
            System.arraycopy(data, src, out, dst, rowLen)
          case 1 => // Sub
            while (i < rowLen) {
              val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
              out(dst + i) = ((data(src + i) & 0xff) + left).toByte
              i += 1
            }
          case 2 => // Up
            while (i < rowLen) {
              out(dst + i) = ((data(src + i) & 0xff) + (prev(i) & 0xff)).toByte
              i += 1
            }
          case 3 => // Average
            while (i < rowLen) {
              val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
              val up = prev(i) & 0xff
              out(dst + i) = ((data(src + i) & 0xff) + ((left + up) >> 1)).toByte
              i += 1
            }
          case 4 => // Paeth
            while (i < rowLen) {
              val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
              val b = prev(i) & 0xff
              val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              out(dst + i) = ((data(src + i) & 0xff) + pred).toByte
              i += 1
            }
          case _ => return null // unknown row tag — corrupt
        }
        System.arraycopy(out, dst, prev, 0, rowLen)
        r += 1
      }
      out
    } else null // predictors 3..9 are not defined by the spec
  }

  /** ASCIIHexDecode: hex pairs, whitespace ignored, `>` terminates, an
    * odd trailing digit is padded with 0 (spec §7.4.2). */
  private[pdf] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode: 5 chars (!..u) → 4 bytes base-85; `z` = four zero
    * bytes; `~>` terminates; a partial group of n chars yields n−1
    * bytes after padding with 'u' (spec §7.4.3). */
  private[pdf] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
      var tuple = 0L
      var cnt = 0
      var i = 0
      if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
      var done = false
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '~') done = true
        else if (c == 'z' && cnt == 0) {
          out.write(0); out.write(0); out.write(0); out.write(0)
        } else if (c >= '!' && c <= 'u') {
          tuple = tuple * 85 + (c - '!')
          cnt += 1
          if (cnt == 5) {
            out.write(((tuple >> 24) & 0xff).toInt)
            out.write(((tuple >> 16) & 0xff).toInt)
            out.write(((tuple >> 8) & 0xff).toInt)
            out.write((tuple & 0xff).toInt)
            tuple = 0L; cnt = 0
          }
        } // anything else (whitespace): skip
        i += 1
      }
      if (cnt > 1) {
        var t = tuple
        var p = cnt
        while (p < 5) { t = t * 85 + 84; p += 1 } // pad with 'u'
        val bs = Array(((t >> 24) & 0xff).toByte, ((t >> 16) & 0xff).toByte,
          ((t >> 8) & 0xff).toByte, (t & 0xff).toByte)
        out.write(bs, 0, cnt - 1)
      }
      out.toByteArray
    } catch { case _: Exception => null }
  }

  /** RunLengthDecode: length byte L ∈ [0,127] copies the next L+1 bytes
    * literally; L ∈ [129,255] repeats the next byte 257−L times; 128 is
    * EOD (spec §7.4.5). */
  private[pdf] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, data.length - i)
        out.write(data, i, n)
        i += n
      } else if (i < data.length) {
        val b = data(i) & 0xff
        i += 1
        var r = 257 - l
        while (r > 0) { out.write(b); r -= 1 }
      } else done = true
    }
    out.toByteArray
  }

  /** LZWDecode (spec §7.4.4, TIFF-style): 9→12-bit codes MSB-first,
    * 256 = clear table, 257 = EOD, entries from 258; code width grows
    * one entry EARLY (EarlyChange default 1: at table sizes 511, 1023,
    * 2047). Truncated/invalid input yields the bytes decoded so far. */
  private[pdf] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
      val table = new Array[Array[Byte]](4096)
      var dictSize = 258
      var codeBits = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L
      var bitCnt = 0
      var i = 0
      var done = false
      while (!done) {
        while (bitCnt < codeBits && i < data.length) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xff)
          bitCnt += 8
          i += 1
        }
        if (bitCnt < codeBits) done = true // truncated input
        else {
          val code =
            ((bitBuf >> (bitCnt - codeBits)) & ((1 << codeBits) - 1)).toInt
          bitCnt -= codeBits
          if (code == 256) { dictSize = 258; codeBits = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < 256) Array(code.toByte)
              else if (code < dictSize && table(code) != null) table(code)
              else if (prev != null) prev :+ prev(0) // KwKwK
              else return out.toByteArray // invalid leading code
            out.write(entry, 0, entry.length)
            if (prev != null && dictSize < 4096) {
              table(dictSize) = prev :+ entry(0)
              dictSize += 1
            }
            prev = entry
            if (codeBits < 12 && dictSize + 1 >= (1 << codeBits))
              codeBits += 1 // EarlyChange = 1
            if (out.size > (64 << 20)) done = true
          }
        }
      }
      out.toByteArray
    } catch { case _: Exception => null }
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
  private final case class TStr(v: String, hex: Boolean = false) extends Tok
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
      } else if (c == '<') TStr(readHexString(), hex = true)
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
  private[pdf] def interpretContent(content: String): List[GlyphRun] =
    interpretContent(content, cid = false, Map.empty, Map.empty)

  private[pdf] def interpretContent(content: String, cid: Boolean,
      toUni: Map[Int, String]): List[GlyphRun] =
    interpretContent(content, cid, toUni, Map.empty)

  /** Map a hex string's byte-chars as 2-byte CIDs through the ToUnicode
    * table; unmapped codes (and odd trailing bytes) become U+FFFD. */
  private def decodeCid(raw: String, toUni: Map[Int, String]): String = {
    val sb = new java.lang.StringBuilder(raw.length / 2 + 1)
    var k = 0
    while (k + 1 < raw.length) {
      val code = (raw.charAt(k) << 8) | raw.charAt(k + 1)
      sb.append(toUni.getOrElse(code, "\uFFFD"))
      k += 2
    }
    if (k < raw.length) sb.append('\uFFFD')
    sb.toString
  }

  private[pdf] def interpretContent(content: String, cid: Boolean,
      toUni: Map[Int, String],
      fonts: Map[String, Array[String]]): List[GlyphRun] = {
    if (!content.contains("BT")) return Nil
    val runs = List.newBuilder[GlyphRun]
    var count = 0

    var fontSize = 12.0
    var leading = 14.0
    var lineX = 0.0; var lineY = 0.0
    var curX = 0.0; var curY = 0.0
    // current simple-font decode table (null = identity); selected by Tf
    var fontTable: Array[String] = null
    var lastName: String = null
    // operand stack (numbers/strings since last operator)
    val nums = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastStr: String = null
    var lastStrCid = false // CID hex strings are already fully decoded
    val arr = scala.collection.mutable.ArrayBuffer.empty[Either[String, Double]]
    var arrCid = false // uniform per array: Tf cannot occur inside [ ]
    var inArray = false

    def show(text: String, cidDecoded: Boolean): Unit = {
      if (text.nonEmpty && count < 100000) {
        val decoded =
          if (cidDecoded || fontTable == null) text
          else PdfEncodings.decode(text, fontTable)
        runs += GlyphRun(curX, curY, fontSize, decoded)
        count += 1
        curX += 0.5 * fontSize * text.length
      }
    }

    val it = tokenize(content)
    while (it.hasNext) {
      it.next() match {
        case TNum(v) =>
          if (inArray) arr += Right(v) else nums += v
        case TStr(raw, isHex) =>
          // hex strings route through the CID CMap only when no simple
          // font is selected (a Type0 font is never in `fonts`)
          val viaCid = cid && isHex && fontTable == null
          val v = if (viaCid) decodeCid(raw, toUni) else raw
          if (inArray) { arr += Left(v); arrCid = viaCid }
          else { lastStr = v; lastStrCid = viaCid }
        case TArrOpen => inArray = true; arr.clear()
        case TArrClose => inArray = false
        case TName(v) => lastName = v // consumed by Tf
        case TOp(op) =>
          op match {
            case "Tf" =>
              if (nums.nonEmpty) fontSize = nums.last
              fontTable =
                if (lastName != null) fonts.getOrElse(lastName, null) else null
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
              if (lastStr != null) { show(lastStr, lastStrCid); lastStr = null }
            case "'" =>
              lineY -= leading; curX = lineX; curY = lineY
              if (lastStr != null) { show(lastStr, lastStrCid); lastStr = null }
            case "\"" =>
              lineY -= leading; curX = lineX; curY = lineY
              if (lastStr != null) { show(lastStr, lastStrCid); lastStr = null }
            case "TJ" =>
              arr.foreach {
                case Left(s) => show(s, arrCid)
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
