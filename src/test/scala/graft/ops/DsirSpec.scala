package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dsir: unigram models, integer importance weights, document scoring,
  * hashed-bucket scale path, and top-fraction selection. */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsir-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("importanceWeights: add-one-smoothed integer ratios") {
    val raw = Seq((0L, "a a a b c"), (1L, "a b")).toDF("id", "text")
    val target = Seq((0L, "c c b")).toDF("id", "text")
    // raw counts: a=4 b=2 c=1; target counts: b=1 c=2
    val got = Dsir.importanceWeights(raw, target, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "a" -> 200000L,   // (0+1)*1e6 / (4+1)
      "b" -> 666666L,   // (1+1)*1e6 / (2+1)
      "c" -> 1500000L)) // (2+1)*1e6 / (1+1)
  }

  test("scoreDocs: mean token weight, unknown tokens neutral, empty = 0") {
    val docs = Seq((0L, "a a c"), (1L, "zz"), (2L, "")).toDF("id", "text")
    val weights = Seq(("a", 200000L), ("c", 1500000L))
      .toDF("token", "weight_e6")
    val got = Dsir.scoreDocs(docs, "id", "text", weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // doc 0: (2*200000 + 1500000) / 3 = 633333
    assert(got == Seq((0L, 3L, 633333L), (1L, 1L, 1000000L),
      (2L, 0L, 0L)))
  }

  test("target-like documents outscore off-target documents") {
    val raw = (0L until 40L).map { i =>
      if (i % 4 == 0) (i, "science method theory data")
      else (i, "spam click buy now cheap")
    }.toDF("id", "text")
    val target = raw.filter(col("id") % 4 === 0)
    val weights = Dsir.importanceWeights(raw, target, "text")
    val scored = Dsir.scoreDocs(raw, "id", "text", weights)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sci = scored(0L)
    val spam = scored(1L)
    assert(sci > 5 * spam, s"science=$sci spam=$spam")
  }

  test("hashedWeights: bucket counts fold the vocabulary and broadcast") {
    val raw = Seq((0L, "a b c d e f g h"), (1L, "a a b b"))
      .toDF("id", "text")
    val target = Seq((0L, "a b")).toDF("id", "text")
    val hw = Dsir.hashedWeights(raw, target, "text", buckets = 4)
    val rows = hw.collect()
    assert(rows.length <= 4)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 4))
    // deterministic across evaluations
    val again = Dsir.hashedWeights(raw, target, "text", buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("selectTopFraction keeps exactly the top quarter, ties by id") {
    val scored = (0L until 8L).map(i => (i, 8L - i, 100L - i))
      .toDF("id", "n_tokens", "score")
    val got = Dsir.selectTopFraction(scored, "id", nTiles = 4)
      .filter(col("selected")).select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 1L))
  }
}
