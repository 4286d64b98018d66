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
  * Scale shape: n-gram counting is per-document (explode → two-level
  * aggregate keyed by (id, gram) then id), so the shuffle key space is
  * documents × distinct grams — fully partition-parallel, no global
  * state, map-side combinable at both levels.
  */
object Repetition {

  private def wordNGrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** (idCol, top_bigram_cover_e6, dup_{dupN}gram_cover_e6, n_words) per
    * document. Empty/one-word documents report 0 coverage. `dupN`
    * defaults to Gopher's 5; shorter n raises the signal's hit rate on
    * low-repetition corpora (the oracle query uses 2 so the gate is
    * statistically alive on the synthetic tables). */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              dupN: Int = 5): DataFrame = {
    require(dupN >= 2, s"dupN must be >= 2 (got $dupN)")
    val ws = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      ws.as("ws"))
      .withColumn("n_words", size(col("ws")))
      .withColumn("n_chars", length(col("text")))

    val dupName = s"dup_${dupN}gram_cover_e6"
    def cover(n: Int, dupOnly: Boolean): DataFrame = {
      val grams = base
        .select(col("id"), col("n_chars"),
          explode(wordNGrams(col("ws"), n)).as("g"))
        .groupBy(col("id"), col("n_chars"), col("g"))
        .agg(count(lit(1)).as("c"))
      val covered =
        if (dupOnly)
          grams.filter(col("c") >= 2)
            .groupBy(col("id"), col("n_chars"))
            .agg(sum(col("c") * length(col("g"))).as("cov"))
        else
          grams.groupBy(col("id"), col("n_chars"))
            .agg(max(col("c") * length(col("g"))).as("cov"))
      // integer floor-division (DIV) end to end: `/` on longs is
      // fractional in both Spark and DuckDB, and a double round-trip is
      // a parity hazard the integer form simply doesn't have
      covered.select(col("id"),
        least(lit(1000000L),
          expr("cov * 1000000 DIV greatest(n_chars, 1)"))
          .as(if (dupOnly) dupName else "top_bigram_cover_e6"))
    }

    base.select(col("id"), col("n_words"))
      .join(cover(2, dupOnly = false), Seq("id"), "left")
      .join(cover(dupN, dupOnly = true), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("top_bigram_cover_e6"), lit(0L))
          .as("top_bigram_cover_e6"),
        coalesce(col(dupName), lit(0L)).as(dupName),
        col("n_words").cast("long").as("n_words"))
  }
}
