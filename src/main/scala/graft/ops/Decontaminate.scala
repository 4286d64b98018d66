package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents that
  * overlap an evaluation set at the word n-gram level — the standard
  * guard against test-set leakage in web-scale corpora (GPT-3 used
  * 13-gram overlap; the n is a parameter here and small corpora need a
  * smaller n to be non-degenerate).
  *
  * A document is CONTAMINATED when any of its word n-grams appears in
  * the benchmark's n-gram set. Tokenization is single-space words with
  * empties dropped, n-grams joined back with a single space — plain
  * `string_split` + list slicing in any SQL engine, which is what the
  * oracle recomputes.
  *
  * Scale shape: evaluation sets are small (MBs) next to the corpus, so
  * the benchmark n-gram set is collected once — bounded by
  * `maxBenchNgrams`, the [[Similarity]] pre-collect discipline:
  * the bound is asserted with ONE aggregate job BEFORE anything is
  * collected — and broadcast; scanning is then a per-row kernel, zero
  * shuffles, one map stage with the scan. For blocklists too big to
  * broadcast, [[contaminationJoined]] is the shuffle twin (explode +
  * ids-only aggregate) with identical output, spec-pinned.
  */
object Decontaminate {

  /** Word n-grams of `text` (space-joined), as the kernel computes
    * them. */
  private[ops] def ngramsOf(text: String, n: Int): Array[String] = {
    val ws =
      if (text == null || text.isEmpty) Array.empty[String]
      else text.split(" ", -1).filter(_.nonEmpty)
    if (ws.length < n) Array.empty[String]
    else Array.tabulate(ws.length - n + 1)(i =>
      ws.slice(i, i + n).mkString(" "))
  }

  /** Declarative n-gram column over `textCol` — the same construction
    * as [[ngramsOf]] in `functions._` form (what the oracle mirrors):
    * filter-split → slice windows → space-join. */
  def ngramsCol(textCol: Column, n: Int): Column = {
    val ws = filter(split(textCol, " "), t => length(t) > 0)
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
  }

  /** Distinct benchmark n-grams, collected under an asserted bound and
    * returned as a Set. The count check runs as its own aggregate BEFORE
    * the collect, so an oversized benchmark fails fast without
    * materializing on the driver. */
  def collectBenchNgrams(bench: DataFrame, textCol: String, n: Int,
      maxBenchNgrams: Long = 10000000L): Set[String] = {
    require(n > 0, s"n must be positive (got $n)")
    val grams = bench
      .select(explode(ngramsCol(col(textCol), n)).as("g"))
      .distinct()
    val cnt = grams.count()
    require(cnt <= maxBenchNgrams,
      s"benchmark n-gram set has $cnt distinct grams > bound " +
        s"$maxBenchNgrams — raise maxBenchNgrams or use " +
        "contaminationJoined (the non-broadcast twin)")
    grams.collect().map(_.getString(0)).toSet
  }

  /** Per-document contamination stats against a broadcast benchmark
    * set: (idCol, ngrams_total, hits, contaminated). `hits` counts
    * n-gram POSITIONS that match (occurrences, not distinct grams).
    * Zero shuffles — one pass over each document. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      benchNgrams: Set[String], n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val bc = docs.sparkSession.sparkContext.broadcast(benchNgrams)
    val nn = n
    val statsUdf = udf { text: String =>
      val set = bc.value
      val gs = ngramsOf(text, nn)
      var hits = 0L
      var i = 0
      while (i < gs.length) {
        if (set.contains(gs(i))) hits += 1
        i += 1
      }
      (gs.length.toLong, hits)
    }
    docs
      .withColumn("__c", statsUdf(col(textCol)))
      .select(col(idCol), col("__c._1").as("ngrams_total"),
        col("__c._2").as("hits"),
        (col("__c._2") > 0L).as("contaminated"))
  }

  /** One-call form: collect the benchmark under the bound, then scan. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    contamination(docs, idCol, textCol,
      collectBenchNgrams(bench, benchTextCol, n), n)

  /** Shuffle twin for blocklists too big to broadcast: explode document
    * n-grams, left-join the distinct benchmark set (ids + grams only —
    * no document text crosses the shuffle), aggregate per document.
    * Identical output to [[contamination]] by construction; keeps
    * zero-gram documents via the explode_outer. */
  def contaminationJoined(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val grams = docs
      .select(col(idCol),
        explode_outer(ngramsCol(col(textCol), n)).as("g"))
    val benchGrams = bench
      .select(explode(ngramsCol(col(benchTextCol), n)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1L))
    grams
      .join(benchGrams, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("g")).as("ngrams_total"),
        coalesce(sum(col("__hit")), lit(0L)).as("hits"))
      .withColumn("contaminated", col("hits") > 0L)
  }
}
