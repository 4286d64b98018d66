package graft.text

import java.util.regex.Pattern

/** Language/country hinting from text cues.
  *
  * Ports `_LANG_HINTS` / `_detect_language_and_country` / `detect_metadata`
  * (/root/reference/ocr_service/modules/personal_doc_extractor.py:297-316,
  * :603-609): first matching hint wins; default ("en", "").
  */
object LangHints {

  private val F = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE |
    Pattern.UNICODE_CHARACTER_CLASS
  private def p(re: String) = Pattern.compile(re, F)

  private val Hints: List[(Pattern, String, String)] = List(
    (p("\\b(cpf|cnpj|rg)\\b"), "pt", "BR"),
    (p("\\b(rfc|curp|ine)\\b"), "es", "MX"),
    (p("\\b(dni|nie)\\b"), "es", "ES"),
    (p("\\b(ced[uú]la)\\b"), "es", "CO"),
    (p("\\b(apellido|nombre|fecha|número)\\b"), "es", ""),
    (p("\\b(nom|prénom|date\\s+de\\s+naissance)\\b"), "fr", "FR"),
    (p("\\b(vorname|nachname|geburtsdatum)\\b"), "de", "DE"),
    (p("\\b(nome|data\\s+di\\s+nascita)\\b"), "it", "IT"),
    (p("\\b(national\\s+insurance|ni\\s+number)\\b"), "en", "GB"),
    (p("\\b(social\\s+security|ssn)\\b"), "en", "US"))

  /** Returns (language_code, country_code); country may be "". */
  def detect(text: String): (String, String) = {
    val t = if (text == null) "" else text
    Hints.collectFirst {
      case (pat, lang, country) if pat.matcher(t).find() => (lang, country)
    }.getOrElse(("en", ""))
  }
}
