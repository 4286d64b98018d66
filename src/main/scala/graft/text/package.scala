package graft

/** Shared helpers for the pure text operators (SURVEY §2.3–2.4).
  *
  * The reference is Python; a few of its primitives need care to reproduce
  * byte-identically on the JVM:
  *  - Python `round(x, n)` rounds the exact binary double, ties-to-even.
  *  - Python `re` treats `\d`/`\w`/`\s`/`\b` as Unicode classes on `str`.
  *  - Python `str.isdigit`/`isalnum` are Unicode-aware.
  */
package object text {

  /** Python-compatible round(x, n): exact binary value, HALF_EVEN. */
  def pyRound(x: Double, n: Int): Double = {
    if (x.isNaN || x.isInfinite) x
    else new java.math.BigDecimal(x)
      .setScale(n, java.math.RoundingMode.HALF_EVEN)
      .doubleValue()
  }

  /** Python str.isdigit() per char (Unicode decimal digits). */
  @inline def isPyDigit(c: Char): Boolean = Character.isDigit(c)

  /** Python str.isalnum() per char (letters or digits, Unicode). */
  @inline def isPyAlnum(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** Python str.isspace() per char. */
  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c)

  /** Count of digit chars — `_digit_count`, ocr_engine.py:361-364. */
  def digitCount(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) { if (isPyDigit(s.charAt(i))) n += 1; i += 1 }
    n
  }

  /** Non-digit, non-space char count ("noise"), ocr_engine.py:1057. */
  def noiseCount(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isPyDigit(c) && !isPySpace(c)) n += 1
      i += 1
    }
    n
  }

  /** Digits-only projection (re.sub(r"\D", "", s)). */
  def digitsOnly(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPyDigit(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  import java.util.regex.Pattern
  /** Compile with Unicode classes to match Python `re` semantics. */
  def uPattern(regex: String, flags: Int = 0): Pattern =
    Pattern.compile(regex, flags | Pattern.UNICODE_CHARACTER_CLASS)

  private val wsRun = uPattern("\\s+")

  /** re.sub(r"\s+", " ", s) with Unicode whitespace. */
  def collapseWs(s: String): String = wsRun.matcher(s).replaceAll(" ")

  /** re.sub(r"\s+", " ", s).strip() */
  def collapseWsStrip(s: String): String = collapseWs(s).trim

  /** Python str.strip(): strips Unicode whitespace at both ends
    * (Java's String.trim is ASCII-only). */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** All runs of digits (re.findall(r"\d+", s)). */
  def digitGroups(s: String): List[String] = {
    val m = uPattern("\\d+").matcher(s)
    val b = List.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** " ".join(s[i:i+4] for i in range(0,len,4)).strip() — group in 4s. */
  def groupIn4s(s: String): String = {
    if (s.isEmpty) return ""
    val sb = new java.lang.StringBuilder(s.length + s.length / 4 + 1)
    var i = 0
    while (i < s.length) {
      if (i > 0) sb.append(' ')
      sb.append(s, i, math.min(i + 4, s.length))
      i += 4
    }
    sb.toString.trim
  }
}
