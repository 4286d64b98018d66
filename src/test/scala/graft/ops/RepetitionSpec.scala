package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Repetition: Gopher-style n-gram coverage signals, hand-computed
  * examples (integer e6 arithmetic must match exactly). */
class RepetitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-repetition-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sig(text: String, dupN: Int = 5): (Long, Long, Long) = {
    val r = Repetition.signals(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", dupN)
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("pathological repetition maxes the signals") {
    // "spam ham " * n: every 2-gram is one of two values
    val text = Array.fill(20)("spam ham").mkString(" ")
    val (top, dup, nw) = sig(text, dupN = 5)
    assert(nw == 40L)
    // "spam ham" occurs 20x, len 8 → 160e6/179 chars = 893854
    assert(top == 160L * 1000000L / text.length)
    assert(dup == 1000000L) // capped: every 5-gram repeats
  }

  test("all-distinct words: top covers one bigram, dup is zero") {
    val text = "a1 b2 c3 d4 e5 f6"
    val (top, dup, nw) = sig(text)
    assert(nw == 6L)
    // every bigram unique (count 1): max coverage = 1 * len("a1 b2")=5
    assert(top == 5L * 1000000L / text.length)
    assert(dup == 0L)
  }

  test("hand-computed dup coverage at dupN=2") {
    // bigrams: "x y" x2 (len 3), "y x" x1, "y z" x1 → dup cov = 2*3=6
    val text = "x y x y z" // 9 chars
    val (top, dup, _) = sig(text, dupN = 2)
    assert(top == 6L * 1000000L / 9L)
    assert(dup == 6L * 1000000L / 9L)
  }

  test("short documents (fewer words than n) report zero, not null") {
    assert(sig("solo") == (0L, 0L, 1L))
    assert(sig("") == (0L, 0L, 1L)) // split("") = [""], one empty word
  }

  test("dupN is reflected in the output column name") {
    val cols = Repetition.signals(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", dupN = 3)
      .columns.toSeq
    assert(cols == Seq("doc_id", "top_bigram_cover_e6",
      "dup_3gram_cover_e6", "n_words"))
  }
}
