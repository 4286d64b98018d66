package graft.pdf

/** Byte-decode tables for simple (non-CID) PDF fonts.
  *
  * The reference pipeline rasterizes PDFs and OCRs the pixels
  * (/root/reference/ocr_service/modules/pdf_converter.py:37-113), so it
  * never faces font encodings; a structural text extractor must map the
  * string bytes of non-CID fonts through /Encoding (WinAnsiEncoding,
  * MacRomanEncoding) and /Differences or crawled PDFs mis-decode every
  * accented character.
  *
  * Tables are 256-entry arrays: `table(byte)` → decoded string (usually
  * one char). Glyph names in /Differences resolve through a compact
  * Adobe-Glyph-List subset (Latin-1 + the cp1252 punctuation block)
  * plus the `uniXXXX`/`uXXXX` conventions.
  */
object PdfEncodings {

  /** Identity (Latin-1) table — the extractor's historical behavior and
    * the stand-in for StandardEncoding (identical for ASCII text). */
  lazy val Identity: Array[String] =
    Array.tabulate(256)(b => b.toChar.toString)

  private def charsetTable(name: String): Array[String] =
    if (!java.nio.charset.Charset.isSupported(name)) Identity
    else {
      val cs = java.nio.charset.Charset.forName(name)
      Array.tabulate(256) { b =>
        val s = new String(Array(b.toByte), cs)
        // undefined bytes decode to U+FFFD; keep the Latin-1 identity
        // there instead (never destroy bytes the table can't improve)
        if (s == "�") b.toChar.toString else s
      }
    }

  lazy val WinAnsi: Array[String] = charsetTable("windows-1252")
  lazy val MacRoman: Array[String] = charsetTable("x-MacRoman")

  /** AGL subset: glyph name → string. Latin-1 letters/punctuation and
    * the cp1252 typography block — the names /Differences arrays in
    * crawled documents overwhelmingly use. */
  private val Agl: Map[String, String] = {
    val spec =
      "space:20,exclam:21,quotedbl:22,numbersign:23,dollar:24,percent:25," +
      "ampersand:26,quotesingle:27,parenleft:28,parenright:29,asterisk:2A," +
      "plus:2B,comma:2C,hyphen:2D,period:2E,slash:2F,zero:30,one:31,two:32," +
      "three:33,four:34,five:35,six:36,seven:37,eight:38,nine:39,colon:3A," +
      "semicolon:3B,less:3C,equal:3D,greater:3E,question:3F,at:40," +
      "bracketleft:5B,backslash:5C,bracketright:5D,asciicircum:5E," +
      "underscore:5F,grave:60,braceleft:7B,bar:7C,braceright:7D," +
      "asciitilde:7E,exclamdown:A1,cent:A2,sterling:A3,currency:A4,yen:A5," +
      "brokenbar:A6,section:A7,dieresis:A8,copyright:A9,ordfeminine:AA," +
      "guillemotleft:AB,logicalnot:AC,registered:AE,macron:AF,degree:B0," +
      "plusminus:B1,twosuperior:B2,threesuperior:B3,acute:B4,mu:B5," +
      "paragraph:B6,periodcentered:B7,cedilla:B8,onesuperior:B9," +
      "ordmasculine:BA,guillemotright:BB,onequarter:BC,onehalf:BD," +
      "threequarters:BE,questiondown:BF," +
      "Agrave:C0,Aacute:C1,Acircumflex:C2,Atilde:C3,Adieresis:C4,Aring:C5," +
      "AE:C6,Ccedilla:C7,Egrave:C8,Eacute:C9,Ecircumflex:CA,Edieresis:CB," +
      "Igrave:CC,Iacute:CD,Icircumflex:CE,Idieresis:CF,Eth:D0,Ntilde:D1," +
      "Ograve:D2,Oacute:D3,Ocircumflex:D4,Otilde:D5,Odieresis:D6," +
      "multiply:D7,Oslash:D8,Ugrave:D9,Uacute:DA,Ucircumflex:DB," +
      "Udieresis:DC,Yacute:DD,Thorn:DE,germandbls:DF," +
      "agrave:E0,aacute:E1,acircumflex:E2,atilde:E3,adieresis:E4,aring:E5," +
      "ae:E6,ccedilla:E7,egrave:E8,eacute:E9,ecircumflex:EA,edieresis:EB," +
      "igrave:EC,iacute:ED,icircumflex:EE,idieresis:EF,eth:F0,ntilde:F1," +
      "ograve:F2,oacute:F3,ocircumflex:F4,otilde:F5,odieresis:F6,divide:F7," +
      "oslash:F8,ugrave:F9,uacute:FA,ucircumflex:FB,udieresis:FC,yacute:FD," +
      "thorn:FE,ydieresis:FF," +
      "Euro:20AC,quotesinglbase:201A,florin:192,quotedblbase:201E," +
      "ellipsis:2026,dagger:2020,daggerdbl:2021,circumflex:2C6," +
      "perthousand:2030,Scaron:160,guilsinglleft:2039,OE:152,Zcaron:17D," +
      "quoteleft:2018,quoteright:2019,quotedblleft:201C,quotedblright:201D," +
      "bullet:2022,endash:2013,emdash:2014,tilde:2DC,trademark:2122," +
      "scaron:161,guilsinglright:203A,oe:153,zcaron:17E,Ydieresis:178," +
      "minus:2212,fi:FB01,fl:FB02,dotlessi:131,oslashacute:1FF,nbspace:A0"
    spec.split(',').map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i) -> new String(
        Character.toChars(Integer.parseInt(kv.substring(i + 1), 16)))
    }.toMap
  }

  /** Resolve a /Differences glyph name: AGL subset, uniXXXX/uXXXX hex
    * conventions, single-character names (letters/digits); None when
    * unknown (caller keeps the base-encoding entry). */
  def glyph(name: String): Option[String] = {
    if (name.isEmpty) return None
    Agl.get(name).orElse {
      if (name.length == 1) Some(name)
      else if (name.startsWith("uni") && name.length >= 7 &&
        name.substring(3).forall(isHex))
        parseHex(name.substring(3, 7))
      else if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u' &&
        name.substring(1).forall(isHex))
        parseHex(name.substring(1))
      else None
    }
  }

  private def isHex(c: Char): Boolean = Character.digit(c, 16) >= 0

  private def parseHex(h: String): Option[String] =
    try {
      val cp = Integer.parseInt(h, 16)
      if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp)))
      else None
    } catch { case _: NumberFormatException => None }

  /** Base table for an /Encoding (or /BaseEncoding) name. */
  def baseTable(name: String): Array[String] = name match {
    case "WinAnsiEncoding" => WinAnsi
    case "MacRomanEncoding" => MacRoman
    case _ => Identity // StandardEncoding/PDFDocEncoding ≈ identity here
  }

  /** Apply /Differences entries (code → glyph name) on top of a base. */
  def withDifferences(base: Array[String],
      diffs: Seq[(Int, String)]): Array[String] = {
    val t = base.clone()
    diffs.foreach { case (code, name) =>
      if (code >= 0 && code < 256) glyph(name).foreach(t(code) = _)
    }
    t
  }

  /** Decode a raw byte-string through a table (chars ≥ 256 — already
    * decoded elsewhere — pass through). */
  def decode(raw: String, table: Array[String]): String = {
    var identity = true
    var i = 0
    while (identity && i < raw.length) {
      val c = raw.charAt(i)
      if (c < 256 && !(table(c).length == 1 && table(c).charAt(0) == c))
        identity = false
      i += 1
    }
    if (identity) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c < 256) sb.append(table(c)) else sb.append(c)
      i += 1
    }
    sb.toString
  }
}
