package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level dedup (the CC-Net / RefinedWeb recipe):
  * boilerplate and syndicated text repeat ACROSS documents even when no
  * two whole documents match, so the unit of dedup drops from the
  * document to the paragraph — each distinct paragraph is kept at its
  * first occurrence and every later copy is removed, then documents are
  * rebuilt from their surviving paragraphs.
  *
  * Scale shape: ONE shuffle, keyed on md5(paragraph) (the [[Dedup]]
  * exact-dedup discipline — a 128-bit key dedups exactly at any corpus
  * size without carrying the paragraph text twice); the winner per key
  * is `min(struct(id, idx))` — a map-side-combinable aggregate, so the
  * shuffle carries one candidate per (partition, paragraph), not one
  * per occurrence. First occurrence = smallest (document id, position
  * in document) lexicographically, which makes the output deterministic
  * and independent of partitioning.
  *
  * Skew: a boilerplate paragraph duplicated across millions of pages
  * hash-routes all its occurrences to one join partition (inherent to
  * the per-occurrence keep flag). The winner side is one row per key,
  * so AQE's skew-join split handles the oversized partition — leave
  * `spark.sql.adaptive.skewJoin.enabled` on (default) for crawl-scale
  * runs.
  */
object ParagraphDedup {

  /** Explode text into (id, para_idx, para) rows. `sep` is a regex
    * (default: blank-line paragraph breaks). Empty/whitespace-only
    * fragments are dropped; `para_idx` is the fragment's 0-based
    * position among the SURVIVING fragments of its document. */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n\n+"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        filter(split(col(textCol), sep),
          p => length(trim(p)) > 0).as("ps"))
      .select(col("id"), posexplode(col("ps")).as(Seq("para_idx", "para")))

  /** Pre-chunked variant for corpora without separator structure:
    * fixed `chunkWords`-word windows as the paragraph unit. The same
    * construction is plain SQL (list slicing) in any engine — what the
    * oracle recomputes. */
  def wordChunks(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive (got $chunkWords)")
    docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .select(col("id"),
        explode(transform(
          sequence(lit(0),
            (ceil(size(col("ws")) / lit(chunkWords.toDouble)) - 1)
              .cast("int")),
          i => struct(i.as("para_idx"),
            array_join(slice(col("ws"), i * chunkWords + 1, lit(chunkWords)),
              " ").as("para")))).as("c"))
      .select(col("id"), col("c.para_idx"), col("c.para"))
  }

  /** First-occurrence winner per distinct paragraph: (id, para_idx,
    * para, keep). One shuffle on md5(para); map-side-combined min. */
  def markDuplicates(paras: DataFrame): DataFrame = {
    val keyed = paras.withColumn("pkey", md5(col("para")))
    val winners = keyed
      .groupBy(col("pkey"))
      .agg(min(struct(col("id"), col("para_idx"))).as("winner"))
    keyed.join(winners, Seq("pkey"))
      .withColumn("keep",
        col("id") === col("winner.id") &&
          col("para_idx") === col("winner.para_idx"))
      .select(col("id"), col("para_idx"), col("para"), col("keep"))
  }

  /** Rebuild documents from surviving paragraphs (original order,
    * original separator): (id, text, paras_total, paras_kept).
    * Documents whose every paragraph was seen earlier come back with
    * empty text — downstream filters drop them like any other
    * too-short document. EVERY input id survives: a document whose text
    * has no non-empty paragraph (empty/whitespace-only) emits no
    * paragraph rows, and rejoins as ('', 0, 0) rather than vanishing
    * (it used to be dropped, contradicting this contract). */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            sep: String = "\n\n+", joinSep: String = "\n\n"): DataFrame = {
    val marked = markDuplicates(paragraphs(docs, idCol, textCol, sep))
    val rebuilt = marked
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("paras_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("paras_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("para_idx"), col("para"))))),
            s => s.getField("para")),
          joinSep).as("text"))
      .select(col("id").as(idCol), col("text"),
        col("paras_total"), col("paras_kept"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("paras_total"), lit(0L)).as("paras_total"),
        coalesce(col("paras_kept"), lit(0L)).as("paras_kept"))
  }

  /** Per-document survival stats over fixed word-window chunks —
    * the oracle-comparable form: (id, paras_total, paras_kept).
    *
    * r08 shape: the generic [[markDuplicates]] path joined the winner
    * table back onto the full paragraph rows — an exchange carrying
    * every chunk's TEXT just to derive a boolean that is immediately
    * aggregated away. The stats only need counts, and `paras_kept` per
    * document IS the number of winner rows electing that document:
    * chunk text now dies at the md5, and the three aggregates + final
    * join move (id|16-byte key, long) rows only. Output identical
    * (every doc emits ≥1 chunk, so totals covers every input id).
    */
  def chunkStats(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    val paras = wordChunks(docs, idCol, textCol, chunkWords)
      .select(col("id"), col("para_idx"), md5(col("para")).as("pkey"))
    val totals = paras
      .groupBy(col("id"))
      .agg(count(lit(1)).as("paras_total"))
    val kept = paras
      .groupBy(col("pkey"))
      .agg(min(struct(col("id"), col("para_idx"))).as("winner"))
      .groupBy(col("winner.id").as("id"))
      .agg(count(lit(1)).as("paras_kept"))
    totals.join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("paras_total"),
        coalesce(col("paras_kept"), lit(0L)).as("paras_kept"))
  }
}
