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

  // -- assembled doc-type schemas (FintechNormalizer.normalize,
  // open_source_ocr_stack.py:211-233) --------------------------------

  final case class BankStatementNorm(
      account_holder: Option[String],
      account_number: Option[String],
      statement_period: Option[String],
      currency: Option[String],
      transactions: List[String])

  final case class ReceiptInvoiceNorm(
      merchant: Option[String],
      date: Option[String],
      items: List[String],
      total_amount: Option[String],
      taxes: Option[String])

  final case class LoanApplicationNorm(
      name: Option[String],
      dob: Option[String],
      address: Option[String],
      id_number: Option[String],
      employer: Option[String],
      income: Option[String],
      amount: Option[String])

  /** `_normalize_bank_statement`, open_source_ocr_stack.py:242-269 */
  def normalizeBankStatement(text: String): BankStatementNorm =
    BankStatementNorm(
      account_holder = firstMatch(text,
        "(?i)(?:account\\s*holder|name)[:\\s-]*([A-Z][A-Za-z\\s\\.'-]{3,80})"),
      account_number = firstMatch(text,
        "(?i)(?:account(?:\\s*number)?|acct|iban|clabe)[:\\s#-]*([A-Z0-9\\-]{6,34})"),
      statement_period = firstMatch(text,
        "(?i)(?:statement\\s*period|period)[:\\s-]*([\\w\\s\\-/]{6,40})"),
      currency = firstMatch(text, "\\b(USD|EUR|GBP|MXN|COP)\\b"),
      transactions = transactionLines(text))

  /** `_normalize_receipt_invoice`, open_source_ocr_stack.py:321-345 */
  def normalizeReceiptInvoice(text: String): ReceiptInvoiceNorm =
    ReceiptInvoiceNorm(
      merchant = firstMatch(text,
        "(?i)(?:merchant|store|vendor|shop|seller)[:\\s-]*([^\\n]{2,80})"),
      date = firstMatch(text, DatePattern),
      items = receiptItems(text),
      total_amount = firstMatch(text,
        "(?i)(?:grand\\s*total|total\\s*amount|amount\\s*due|total)" +
          "[:\\s-]*([\\$A-Z]{0,3}\\s?\\d+[\\d,\\.]{0,20})"),
      taxes = firstMatch(text,
        "(?i)(?:tax|vat|gst)[:\\s-]*([\\$A-Z]{0,3}\\s?\\d+[\\d,\\.]{0,20})"))

  /** `_normalize_loan_application` (applicant/employment/loan fields),
    * open_source_ocr_stack.py:271-319 */
  def normalizeLoanApplication(text: String): LoanApplicationNorm =
    LoanApplicationNorm(
      name = firstMatch(text,
        "(?i)(?:name)[:\\s-]*([A-Z][A-Za-z\\s\\.'-]{3,80})"),
      dob = firstMatch(text, DatePattern),
      address = firstMatch(text, "(?i)(?:address)[:\\s-]*([^\\n]{8,120})"),
      id_number = firstMatch(text,
        "(?i)(?:id\\s*number|passport|dni|ssn)[:\\s-]*([A-Z0-9-]{4,24})"),
      employer = firstMatch(text,
        "(?i)(?:employer|company)[:\\s-]*([^\\n]{3,80})"),
      income = firstMatch(text,
        "(?i)(?:income|salary)[:\\s-]*([\\$A-Z]{0,3}\\s?\\d+[\\d,\\.]{0,20})"),
      amount = firstMatch(text,
        "(?i)(?:loan\\s*amount|amount\\s*requested)" +
          "[:\\s-]*([\\$A-Z]{0,3}\\s?\\d+[\\d,\\.]{0,20})"))

  final case class NormalizeCounts(
      n_sections: Int, n_txn_lines: Int, n_receipt_items: Int)

  /** All three T16-T18 counts in ONE text pass surface (single UDF at
    * the call site — three separate UDFs over the same column would
    * deserialize the text three times per row). */
  def counts(text: String): NormalizeCounts =
    NormalizeCounts(
      splitSections(text).size,
      transactionLines(text).size,
      receiptItems(text).size)

  /** Receipt items: amount present & ≥2 tokens, capped at 25.
    * open_source_ocr_stack.py:327-333 */
  def receiptItems(text: String): List[String] = {
    val t = if (text == null) "" else text
    t.linesIterator.filter { line =>
      itemAmount.matcher(line).find() && line.trim.split("\\s+").length >= 2
    }.map(_.trim).take(25).toList
  }
}
