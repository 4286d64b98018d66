package graft.text

import java.util.regex.Pattern

/** Fintech text normalization (sections / transactions / receipt items).
  *
  * Ports `FintechNormalizer` (/root/reference/ocr_service/modules/
  * open_source_ocr_stack.py:208-353): section splitting on blank lines,
  * bank-statement transaction-line extraction, receipt item extraction
  * (cap 25), and the first-match helper.
  */
object Normalizer {

  val DatePattern = "\\b\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}\\b"
  val TxnDatePattern = "\\d{1,2}[/-]\\d{1,2}(?:[/-]\\d{2,4})?"

  private val F = Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS
  private def p(re: String, flags: Int = 0) = Pattern.compile(re, F | flags)

  private val blankLineSplit = p("\\n\\s*\\n")
  private val txnDate = p(TxnDatePattern)
  private val txnAmount = p("[-+]?\\$?\\d+[\\d,]*\\.\\d{2}")
  private val itemAmount = p("\\d+[\\d,]*\\.\\d{2}")

  /** `_split_sections` — split on blank lines, trim, drop empties. */
  def splitSections(text: String): List[String] = {
    val t = if (text == null) "" else text
    blankLineSplit.split(t).iterator.map(_.trim).filter(_.nonEmpty).toList
  }

  /** `first_match(text, pattern)` — group 1 if the pattern has groups,
    * else the whole match; trimmed; None when empty. */
  def firstMatch(text: String, pattern: String): Option[String] = {
    val m = p(pattern).matcher(if (text == null) "" else text)
    if (!m.find()) return None
    val v = if (m.groupCount() >= 1) Option(m.group(1)).getOrElse("")
            else m.group()
    val trimmed = v.trim
    if (trimmed.isEmpty) None else Some(trimmed)
  }

  /** Bank-statement transaction lines: date-like AND amount-like.
    * open_source_ocr_stack.py:253-258 */
  def transactionLines(text: String): List[String] = {
    val t = if (text == null) "" else text
    t.linesIterator.filter { line =>
      txnDate.matcher(line).find() && txnAmount.matcher(line).find()
    }.map(_.trim).toList
  }

  /** Receipt items: amount present & ≥2 tokens, capped at 25.
    * open_source_ocr_stack.py:327-333 */
  def receiptItems(text: String): List[String] = {
    val t = if (text == null) "" else text
    t.linesIterator.filter { line =>
      itemAmount.matcher(line).find() && line.trim.split("\\s+").length >= 2
    }.map(_.trim).take(25).toList
  }
}
