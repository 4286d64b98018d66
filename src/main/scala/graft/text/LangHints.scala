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

  // Each hint carries lowercase gate literals: a cheap necessary
  // condition checked on the lowercased text before running the regex
  // (pure pruning — identical first-match-by-hint-order semantics).
  private val Hints: List[(Pattern, List[String], String, String)] = List(
    (p("\\b(cpf|cnpj|rg)\\b"), List("cpf", "cnpj", "rg"), "pt", "BR"),
    (p("\\b(rfc|curp|ine)\\b"), List("rfc", "curp", "ine"), "es", "MX"),
    (p("\\b(dni|nie)\\b"), List("dni", "nie"), "es", "ES"),
    (p("\\b(ced[uú]la)\\b"), List("cedula", "cedúla"), "es", "CO"),
    (p("\\b(apellido|nombre|fecha|número)\\b"),
      List("apellido", "nombre", "fecha", "número"), "es", ""),
    (p("\\b(nom|prénom|date\\s+de\\s+naissance)\\b"),
      List("nom", "prénom", "naissance"), "fr", "FR"),
    (p("\\b(vorname|nachname|geburtsdatum)\\b"),
      List("vorname", "nachname", "geburtsdatum"), "de", "DE"),
    (p("\\b(nome|data\\s+di\\s+nascita)\\b"),
      List("nome", "nascita"), "it", "IT"),
    (p("\\b(national\\s+insurance|ni\\s+number)\\b"),
      List("insurance", "number"), "en", "GB"),
    (p("\\b(social\\s+security|ssn)\\b"),
      List("security", "ssn"), "en", "US"))

  /** Returns (language_code, country_code); country may be "". */
  def detect(text: String): (String, String) = {
    val t = if (text == null) "" else text
    detectLower(t, t.toLowerCase)
  }

  /** detect() with a caller-provided lowercase copy. */
  def detectLower(t: String, lower: String): (String, String) = {
    Hints.collectFirst {
      case (pat, gates, lang, country)
          if gates.exists(lower.contains) && pat.matcher(t).find() =>
        (lang, country)
    }.getOrElse(("en", ""))
  }
}
