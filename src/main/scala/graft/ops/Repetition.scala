package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", table A1 — the standard web-corpus repetition
  * screens): machine-generated and template pages repeat short word
  * n-grams far more than prose, so per-document repetition coverage is
  * a cheap, language-agnostic quality gate that runs BEFORE any
  * model-based scoring.
  *
  * Two signals per document, both as e6-scaled integers computed with
  * integer arithmetic end to end (bit-identical in any engine — the
  * oracle recomputes them in plain SQL):
  *
  *  - `top_bigram_cover_e6`: coverage of the single most-covering word
  *    2-gram — max over grams of occurrences × gram-chars, scaled by
  *    1e6 / text-chars. (Gopher's "fraction of characters in the most
  *    frequent n-gram"; we take the max of count×length directly, which
  *    is deterministic under ties where count-first ranking is not.)
  *  - `dup_5gram_cover_e6`: summed coverage of every word 5-gram that
  *    occurs at least twice (Gopher's "fraction of characters inside
  *    duplicated n-grams"), capped at 1e6 — overlapping occurrences
  *    make the uncapped sum a coverage ESTIMATE, same as the published
  *    filter.
  *
  * Scale shape: the computation is PER-DOCUMENT (no cross-document
  * state), so it runs as a single per-row kernel — zero shuffles, one
  * pass over the scan. The first version exploded n-grams through a
  * two-level distributed aggregate (4 exchanges of documents ×
  * distinct-gram rows); for a statistic with no cross-row dependency
  * that shuffle volume bought nothing, and at 10^12 documents it is
  * the difference between a map stage and a four-stage job.
  */
object Repetition {

  /** Per-document kernel: (top2_cover, dup_cover, n_words) as raw
    * integer coverages (not yet e6-scaled). Tokenization is
    * split-on-single-space KEEPING empty tokens (split limit -1),
    * grams joined with one space, characters counted as code points —
    * each choice pinned to what `split`/`array_join`/`length` mean in
    * Spark SQL and what the DuckDB oracle recomputes. */
  private[ops] def coverCounts(text: String, dupN: Int)
      : (Long, Long, Int) = {
    val ws = text.split(" ", -1)
    def gramStats(n: Int): collection.mutable.HashMap[String, Int] = {
      val m = new collection.mutable.HashMap[String, Int]()
      var i = 0
      while (i + n <= ws.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j)); j += 1
        }
        val g = sb.toString
        m.update(g, m.getOrElse(g, 0) + 1)
        i += 1
      }
      m
    }
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    var top2 = 0L
    gramStats(2).foreach { case (g, c) =>
      val cov = c * cp(g); if (cov > top2) top2 = cov
    }
    var dup = 0L
    gramStats(dupN).foreach { case (g, c) =>
      if (c >= 2) dup += c * cp(g)
    }
    (top2, dup, ws.length)
  }

  /** The per-row kernel as a Column: struct(top_bigram_cover_e6,
    * dup_cover_e6, n_words) — composable into a wider single-pass
    * projection (the curation funnel computes every per-row gate in
    * one map stage this way). */
  def signalsStruct(text: Column, dupN: Int = 5): Column = {
    require(dupN >= 2, s"dupN must be >= 2 (got $dupN)")
    val kernel = udf((text: String) => {
      val t = if (text == null) "" else text
      val (top2, dup, nw) = coverCounts(t, dupN)
      // integer floor division end to end: `/` on longs is fractional
      // in both Spark and DuckDB, and a double round-trip is a parity
      // hazard the integer form simply doesn't have
      val chars = math.max(t.codePointCount(0, t.length), 1).toLong
      (math.min(1000000L, top2 * 1000000L / chars),
        math.min(1000000L, dup * 1000000L / chars),
        nw.toLong)
    })
    kernel(text)
  }

  /** (idCol, top_bigram_cover_e6, dup_{dupN}gram_cover_e6, n_words) per
    * document. Empty/one-word documents report 0 coverage. `dupN`
    * defaults to Gopher's 5; shorter n raises the signal's hit rate on
    * low-repetition corpora (the oracle query uses 2 so the gate is
    * statistically alive on the synthetic tables). */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              dupN: Int = 5): DataFrame = {
    val dupName = s"dup_${dupN}gram_cover_e6"
    docs.select(col(idCol), signalsStruct(col(textCol), dupN).as("s"))
      .select(col(idCol),
        col("s._1").as("top_bigram_cover_e6"),
        col("s._2").as(dupName),
        col("s._3").as("n_words"))
  }
}
