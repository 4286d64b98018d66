package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JaccardExact.pairsE6 must reproduce the naive per-pair string-set
  * Jaccard on the same shingle construction (the r08 broadcast-block
  * merge kernel replaced a per-pair nested-loop join — outputs must be
  * identical). */
class JaccardExactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jaccardexact-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** The oracle-side construction: lowercase whitespace tokens, distinct
    * word-3-gram strings (short docs: the whole token string). */
  private def shingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length >= 3)
      toks.sliding(3).map(_.mkString(" ")).toSet
    else if (toks.nonEmpty) Set(toks.mkString(" "))
    else Set.empty
  }

  private def naivePairs(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    (for {
      i <- docs.indices
      j <- (i + 1) until docs.length
      (a, ta) = docs(i)
      (b, tb) = docs(j)
      sa = shingles(ta)
      sb = shingles(tb)
      inter = sa.intersect(sb).size
      uni = sa.size + sb.size - inter
      if uni > 0
    } yield (math.min(a, b), math.max(a, b)) ->
      math.round(inter * 1000000.0 / uni)).toMap

  private def kernelPairs(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val df = docs.toDF("doc_id", "text")
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    val keyed = df
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("nt", size(col("toks")))
      .withColumn("sh",
        when(col("nt") >= 3, array_distinct(
          transform(sequence(lit(1), col("nt") - 2), i =>
            concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2)))))
          .when(col("nt") > 0, array(concat_ws(" ", col("toks"))))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"),
        array_sort(transform(col("sh"), s => xxhash64(s))).as("keys"))
    JaccardExact.pairsE6(keyed)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("matches the naive string-set reference on a mixed corpus") {
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over a sleeping dog",
      2L -> "completely different words entirely here now",
      3L -> "the quick brown fox jumps over the lazy dog", // dup of 0
      4L -> "short one", // < 3 tokens
      5L -> "", // empty
      6L -> "the quick brown", // exactly 3 tokens
      7L -> "THE QUICK BROWN fox Jumps OVER the lazy dog") // case-folded dup
    assert(kernelPairs(docs) == naivePairs(docs))
  }

  test("matches the naive reference on a seeded random corpus") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    assert(kernelPairs(docs) == naivePairs(docs))
  }

  test("oversized sample fails fast before the collect") {
    val docs = (0L until 50L).map(i => i -> ("tok " * 40).trim).toDF(
      "doc_id", "text")
    val keyed = docs.select(col("doc_id"),
      array_sort(transform(
        array_distinct(filter(split(col("text"), " "), t => length(t) > 0)),
        s => xxhash64(s))).as("keys"))
    val e = intercept[IllegalArgumentException] {
      JaccardExact.pairsE6(keyed, broadcastBudget = 4L)
    }
    assert(e.getMessage.contains("broadcast budget"))
  }
}
