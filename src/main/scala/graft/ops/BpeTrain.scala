package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al., ACL 2016 — the
  * tokenizer-vocabulary induction every LLM pipeline runs before
  * tokenizing): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair, emit the ordered merge list that
  * [[encode]] then applies.
  *
  * The classic scale trick does the heavy lifting: training runs on the
  * WORD-FREQUENCY table, not the corpus — one map-combinable word count
  * collapses 10^12 tokens into a vocabulary-sized frame (Zipf: a few
  * million rows at web scale), and every merge round is then one
  * flatMap + one map-combined aggregate over that frame. Each round
  * collects exactly ONE row (the arg-max pair, `limit(1)` after an
  * exact sort) — never the pair table. Ties break deterministically
  * (freq desc, then pair lexicographic), so the merge list is
  * bit-stable across runs, partitionings, and cluster sizes.
  * Per-round `localCheckpoint` truncates the growing lineage the same
  * way [[DupClusters.connectedComponents]] does.
  *
  * DuckDB cannot replay an iterative argmax-and-rewrite loop, so the
  * driver row is constant-oracled (the x_extract_md5 pattern): the
  * merge list over the deterministic corpus is pinned against
  * checked-in constants, and the hand-computable algebra (pair counts,
  * tie-breaks, round-by-round rewrites) is spec-tested on the
  * Sennrich-style example.
  */
object BpeTrain {

  /** Word-frequency table: (word, freq) — single-space tokens, empties
    * dropped. The ONE pass over the corpus; everything after runs on
    * this reduction. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), " "),
        t => length(t) > 0)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merges on a word-frequency table. Returns the
    * ordered merge list (left, right); stops early when no pair reaches
    * `minPairFreq`. */
  def trainMerges(wordFreqs: DataFrame, numMerges: Int,
      minPairFreq: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0 (got $numMerges)")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1 (got $minPairFreq)")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    // (symbols, freq): start each word as its character sequence
    var table = wordFreqs
      .select(col("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.toCharArray.map(_.toString), f) }
      .toDF("symbols", "freq")
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val best = table.as[(Seq[String], Long)]
        .flatMap { case (syms, f) =>
          (0 until syms.length - 1).iterator
            .map(i => ((syms(i), syms(i + 1)), f))
        }
        .toDF("pair", "freq")
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("freq"))
        .orderBy(col("freq").desc, col("pair._1").asc, col("pair._2").asc)
        .limit(1)
        .as[((String, String), Long)]
        .collect()
      best.headOption match {
        case Some(((a, b), f)) if f >= minPairFreq =>
          merges += ((a, b))
          val (ma, mb) = (a, b)
          table = table.as[(Seq[String], Long)]
            .map { case (syms, fr) => (mergePair(syms, ma, mb), fr) }
            .toDF("symbols", "freq")
            .localCheckpoint()
          round += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** Apply one merge (a, b) → a+b left-to-right over a symbol
    * sequence. */
  private[ops] def mergePair(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word under an ordered merge list: apply every merge in
    * training order (the standard BPE apply; rank order == apply order
    * gives the canonical segmentation). */
  private[ops] def encodeWord(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.toCharArray.map(_.toString).toSeq
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = mergePair(syms, a, b)
    }
    syms
  }

  /** Tokenize documents under a trained merge list: adds
    * `bpe_tokens` (count) and `bpe_ratio_e6` (BPE tokens per word,
    * e6-scaled — the compression the vocabulary buys). Broadcast
    * merges, per-row kernel, zero shuffles. */
  def withBpeTokenCounts(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    val countUdf = udf { text: String =>
      val ws =
        if (text == null || text.isEmpty) Array.empty[String]
        else text.split(" ", -1).filter(_.nonEmpty)
      val m = bc.value
      var toks = 0L
      var i = 0
      while (i < ws.length) {
        toks += encodeWord(ws(i), m).length
        i += 1
      }
      val ratioE6 = if (ws.length == 0) 0L else toks * 1000000L / ws.length
      (ws.length.toLong, toks, ratioE6)
    }
    docs
      .withColumn("__b", countUdf(col(textCol)))
      .withColumn("n_words", col("__b._1"))
      .withColumn("bpe_tokens", col("__b._2"))
      .withColumn("bpe_ratio_e6", col("__b._3"))
      .drop("__b")
  }
}
