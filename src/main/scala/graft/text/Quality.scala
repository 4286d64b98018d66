package graft.text

import graft.model.QualityResult

/** Rule-based extraction-quality evaluator.
  *
  * Ports `FintechQualityEvaluator` (/root/reference/ocr_service/modules/
  * open_source_ocr_stack.py:61-205): base = 0.35·min(len/700,1) +
  * 0.35·alnum_ratio + 0.30·printable_ratio, plus doc-type signal bonuses;
  * classify GOOD≥0.75 / UNUSABLE<0.45 / else PARTIAL.
  */
object Quality {

  private val txnLike = uPattern("\\b\\d{1,2}[/-]\\d{1,2}([/-]\\d{2,4})?\\b")
  private val currency = uPattern("\\b(?:USD|EUR|GBP|MXN|COP|\\$|€)\\s?\\d+[\\d,\\.]*\\b")
  private val accountLike = uPattern("\\b(?:acct|account|iban|clabe|iban:)\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val dateLike = uPattern("\\b\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}\\b")
  private val idLike = uPattern("\\b(?:id|passport|dni|ssn|tax id)\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val merchantLike = uPattern(
    "\\b(?:store|market|shop|merchant|invoice|receipt)\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val totalLike = uPattern("\\b(?:total|amount due|grand total)\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val nameWord = uPattern("\\bname\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val addressWord = uPattern("\\baddress\\b",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s); var n = 0
    while (m.find()) n += 1
    n
  }
  private def has(p: java.util.regex.Pattern, s: String): Boolean =
    p.matcher(s).find()

  private def alnumRatio(text: String): Double = {
    if (text.isEmpty) return 0.0
    var n = 0; var i = 0
    while (i < text.length) { if (isPyAlnum(text.charAt(i))) n += 1; i += 1 }
    n.toDouble / math.max(text.length, 1)
  }

  private def printableRatio(text: String): Double = {
    if (text.isEmpty) return 0.0
    var n = 0; var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if ((c > 31 && c < 127) || c == '\n' || c == '\r' || c == '\t') n += 1
      i += 1
    }
    n.toDouble / math.max(text.length, 1)
  }

  private def bankStatementHits(text: String): Int =
    (if (has(accountLike, text)) 1 else 0) +
      (if (countMatches(currency, text) >= 2) 1 else 0) +
      (if (countMatches(txnLike, text) >= 3) 1 else 0)

  private def kycHits(text: String): Int =
    (if (has(nameWord, text)) 1 else 0) +
      (if (has(dateLike, text)) 1 else 0) +
      (if (has(addressWord, text)) 1 else 0) +
      (if (has(idLike, text)) 1 else 0)

  private def receiptHits(text: String): Int =
    (if (has(merchantLike, text)) 1 else 0) +
      (if (has(dateLike, text)) 1 else 0) +
      (if (has(totalLike, text)) 1 else 0) +
      (if (has(currency, text)) 1 else 0)

  def evaluate(rawText: String, documentType: String): QualityResult = {
    // Python str.strip() semantics (Unicode whitespace), see pyStrip
    val text = pyStrip(if (rawText == null) "" else rawText)
    if (text.isEmpty)
      return QualityResult(0.0, "UNUSABLE", Seq("EMPTY_TEXT"))

    val alnum = alnumRatio(text)
    val printable = printableRatio(text)
    val lengthScore = math.min(text.length / 700.0, 1.0)

    val baseScore = 0.35 * lengthScore + 0.35 * alnum + 0.30 * printable
    var score = math.min(math.max(baseScore, 0.0), 1.0)
    val reasons = scala.collection.mutable.ListBuffer.empty[String]

    val docType =
      (if (documentType == null) "other" else documentType).toLowerCase.trim
    // doc-type signal bonuses, open_source_ocr_stack.py:119-147
    if (docType == "bank_statement") {
      val hits = bankStatementHits(text)
      if (hits < 2) reasons += "BANK_STATEMENT_SIGNALS_WEAK"
      score = math.min(1.0, score + 0.12 * hits)
    } else if (docType == "loan_application" || docType == "kyc_form") {
      val hits = kycHits(text)
      if (hits < 2) reasons += "KYC_SIGNALS_WEAK"
      score = math.min(1.0, score + 0.10 * hits)
    } else if (docType == "receipt" || docType == "invoice") {
      val hits = receiptHits(text)
      if (hits < 2) reasons += "RECEIPT_SIGNALS_WEAK"
      score = math.min(1.0, score + 0.09 * hits)
    }

    if (printable < 0.85) reasons += "LOW_PRINTABLE_RATIO"
    if (alnum < 0.35) reasons += "LOW_ALNUM_RATIO"
    if (text.length < 30) reasons += "TEXT_TOO_SHORT"

    val classification =
      if (score >= 0.75) "GOOD"
      else if (score < 0.45) "UNUSABLE"
      else "PARTIAL"

    QualityResult(pyRound(score, 4), classification, reasons.toList)
  }
}
