package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a
  * `documents`-shaped table. All per-row (narrow); the heavy ones are
  * pure `functions._` compositions so they stay in whole-stage codegen
  * and have straightforward SQL oracles.
  */
object TextAnalysis {

  /** Whitespace token count (SQL-oracle-friendly). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-ish token count: word pieces + standalone
    * punctuation, via regexp count. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality-scoring signals (length/punct/stopword ratios) — the
    * training-data analog of C4 quality scoring. */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val t = col("text")
    val len = length(t)
    val alnum = length(regexp_replace(t, "[^A-Za-z0-9]", ""))
    val punct = length(regexp_replace(t, "[^.,;:!?'\"()-]", ""))
    val stopwordHits = StopwordsEn.foldLeft(lit(0)) { (acc, w) =>
      acc + when(t.rlike("(?i)\\b" + w + "\\b"), 1).otherwise(0)
    }
    docs.select(
      col("doc_id"),
      len.as("n_chars"),
      tokenCount(t).as("n_tokens"),
      round(alnum.cast("double") / greatest(len, lit(1)), 6).as("alnum_ratio"),
      round(punct.cast("double") / greatest(len, lit(1)), 6).as("punct_ratio"),
      stopwordHits.as("stopword_hits"),
      round(least(len.cast("double") / 700.0, lit(1.0)), 6).as("length_score"))
  }

  private val StopwordsEn = List(
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "was")

  /** n-gram-profile language ID over {en, es, fr, de, pt}: counts of
    * language-marker function words; deterministic argmax (tie → fixed
    * order en,es,fr,de,pt). Pure function — used via udf. */
  def languageId(text: String): String = LangIdKernel.detect(text)

  private val langIdUdf = udf((t: String) => LangIdKernel.detect(t))

  def withLanguageId(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", langIdUdf(col("text")))
}

/** Deterministic marker-word language identifier. */
object LangIdKernel {
  private val Markers: List[(String, Set[String])] = List(
    "en" -> Set("the", "and", "of", "is", "that", "with", "for", "this",
      "are", "was", "not", "you"),
    "es" -> Set("el", "la", "los", "las", "que", "de", "en", "por", "para",
      "una", "con", "es"),
    "fr" -> Set("le", "les", "des", "une", "est", "dans", "pour", "que",
      "qui", "avec", "sur", "pas"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "eine", "für", "auf", "werden"),
    "pt" -> Set("o", "os", "das", "um", "uma", "não", "com", "para", "por",
      "mais", "como", "foi"))

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val tokens = text.toLowerCase.split("[^\\p{L}]+")
    if (tokens.isEmpty) return "und"
    var bestLang = "und"
    var bestScore = 0
    Markers.foreach { case (lang, set) =>
      var score = 0
      var i = 0
      while (i < tokens.length) {
        if (set.contains(tokens(i))) score += 1
        i += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }
    bestLang
  }
}
