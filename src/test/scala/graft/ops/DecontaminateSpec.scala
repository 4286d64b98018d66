package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontaminate: n-gram kernel/declarative parity, broadcast vs
  * shuffle-twin equality, occurrence counting, bounds. */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-decontaminate-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("ngramsOf: windows, short text, empties") {
    assert(Decontaminate.ngramsOf("a b c d", 2).toSeq ==
      Seq("a b", "b c", "c d"))
    assert(Decontaminate.ngramsOf("a b", 3).isEmpty)
    assert(Decontaminate.ngramsOf("a b c", 3).toSeq == Seq("a b c"))
    assert(Decontaminate.ngramsOf(" a  b ", 2).toSeq == Seq("a b"))
    assert(Decontaminate.ngramsOf("", 2).isEmpty)
    assert(Decontaminate.ngramsOf(null, 2).isEmpty)
  }

  test("ngramsCol equals the kernel on adversarial spacing") {
    val texts = Seq("a b c d e", "  x ", "", "q w e r", "a a a a a a",
      "one", " leading two  gaps   three ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val declarative = df.select(col("id"),
        Decontaminate.ngramsCol(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[String](1).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(declarative(i.toLong) ==
          Decontaminate.ngramsOf(t, n).toSeq, s"n=$n text='$t'")
      }
    }
  }

  test("hits count occurrences, not distinct grams") {
    val docs = Seq((0L, "x y x y x y")).toDF("id", "text")
    val got = Decontaminate.contamination(docs, "id", "text",
      Set("x y"), n = 2).collect().head
    // grams: x y, y x, x y, y x, x y -> 3 hits of 5
    assert((got.getLong(1), got.getLong(2), got.getBoolean(3)) ==
      (5L, 3L, true))
  }

  test("broadcast and shuffle twins produce identical output") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 300L).map { i =>
      val len = rnd.nextInt(14) // includes 0-token and <n docs
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("id", "text")
    val bench = (0L until 10L).map { i =>
      (i, Seq.fill(6)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("bid", "text")
    val n = 3
    val a = Decontaminate.contamination(docs, "id", "text", bench,
      "text", n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val b = Decontaminate.contaminationJoined(docs, "id", "text", bench,
      "text", n).select("id", "ngrams_total", "hits", "contaminated")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.size == 300) // zero-gram docs present in both
    assert(a.exists(_._4), "fixture degenerate: nothing contaminated")
    assert(a.exists(!_._4), "fixture degenerate: everything contaminated")
  }

  test("collectBenchNgrams enforces the pre-collect bound") {
    val bench = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i"))
      .toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontaminate.collectBenchNgrams(bench, "text", 2,
        maxBenchNgrams = 10)
    }
    assert(e.getMessage.contains("maxBenchNgrams"))
  }
}
