package graft.text

/** Exact evaluator for `\b(?:alt1|alt2|…)\b` word-alternation regexes
  * (CASE_INSENSITIVE | UNICODE_CASE | UNICODE_CHARACTER_CLASS), where
  * each alternative is a sequence of literal words joined by `\s+`.
  *
  * Java's regex engine has no fast literal prescan for alternations, so
  * a no-match `has()` costs a full per-position scan (~60 µs on a 3 KB
  * page). This matcher instead probes only `indexOf` occurrences of each
  * alternative's first word in the aligned lowercase copy, checking `\b`
  * via [[graft.text.isRegexWordChar]] and `\s+` via
  * [[graft.text.isRegexWs]] — the exact primitives RegexParitySpec pins
  * to the regex classes. Callers fall back to the Pattern when
  * `lower.length != text.length` (rare one-to-many lowercasing, e.g.
  * U+0130) — parity with the regex is fuzz-asserted in ScoringSpec.
  */
object WordAlts {

  /** Does any alternative match with word boundaries on both ends? */
  def has(lower: String, alts: Array[Array[String]]): Boolean = {
    var a = 0
    while (a < alts.length) {
      if (hasPhrase(lower, alts(a))) return true
      a += 1
    }
    false
  }

  private def hasPhrase(lower: String, words: Array[String]): Boolean = {
    val first = words(0)
    var p = lower.indexOf(first)
    while (p >= 0) {
      if (p == 0 || !isRegexWordChar(lower.charAt(p - 1))) {
        var i = p + first.length
        var w = 1
        var ok = true
        while (ok && w < words.length) {
          val wsStart = i
          while (i < lower.length && isRegexWs(lower.charAt(i))) i += 1
          if (i == wsStart) ok = false // \s+ needs at least one
          else {
            val word = words(w)
            if (lower.regionMatches(i, word, 0, word.length)) {
              i += word.length
              w += 1
            } else ok = false
          }
        }
        if (ok && (i == lower.length || !isRegexWordChar(lower.charAt(i))))
          return true
      }
      p = lower.indexOf(first, p + 1)
    }
    false
  }

  /** Alternatives whose inner spaces are `\s+` in the regex ("date de
    * naissance" ≡ `date\s+de\s+naissance`). */
  def phrases(spec: String): Array[Array[String]] =
    spec.split('|').map(_.split(' ').filter(_.nonEmpty))

  /** Alternatives that are pure literals — inner spaces are LITERAL
    * single spaces in the regex ("amount due" ≡ `amount due`, which does
    * NOT match "amount  due"). */
  def literals(spec: String): Array[Array[String]] =
    spec.split('|').map(a => Array(a))
}
