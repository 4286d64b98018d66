package graft.text

/** Luhn checksum utilities.
  *
  * Ports the reference's `luhn_ok` / `compute_luhn_check_digit`
  * (/root/reference/ocr_service/modules/pan_candidates.py:129-176) exactly.
  */
object Luhn {

  /** True when `pan` is a non-empty digits-only string passing Luhn.
    * pan_candidates.py:129-147. */
  def luhnOk(pan: String): Boolean = {
    if (pan == null || pan.isEmpty) return false
    var i = 0
    while (i < pan.length) {
      if (!isPyDigit(pan.charAt(i))) return false
      i += 1
    }
    var total = 0
    var idx = 0
    i = pan.length - 1
    while (i >= 0) {
      var digit = pan.charAt(i) - '0'
      if (idx % 2 == 1) {
        digit *= 2
        if (digit > 9) digit -= 9
      }
      total += digit
      idx += 1
      i -= 1
    }
    total % 10 == 0
  }

  /** Luhn check digit for a PAN body (digits-only, non-empty).
    * pan_candidates.py:150-176. Throws on invalid input like the reference. */
  def checkDigit(body: String): Int = {
    require(body != null && body.nonEmpty, "body must be non-empty")
    require(body.forall(isPyDigit), "body must contain only digits")
    var total = 0
    var idx = 0
    var i = body.length - 1
    while (i >= 0) {
      var digit = body.charAt(i) - '0'
      if (idx % 2 == 0) {
        digit *= 2
        if (digit > 9) digit -= 9
      }
      total += digit
      idx += 1
      i -= 1
    }
    (10 - (total % 10)) % 10
  }

  /** 13–19-digit Luhn gate — `DocumentIntelligence.is_valid_luhn`,
    * document_intelligence.py:330-333 / `_luhn_valid`,
    * personal_doc_extractor.py:330-333. */
  def isValidCardNumber(number: String): Boolean =
    number != null && number.nonEmpty && number.forall(isPyDigit) &&
      number.length >= 13 && number.length <= 19 && luhnOk(number)
}
