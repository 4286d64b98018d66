package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IncrementalDedup: the bloom-accelerated path must be
  * result-identical to the plain anti-join under every filter
  * configuration — including one sized to force false positives. */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incdedup-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def urls(ids: Seq[Int], prefix: String = "https://example.com/p") =
    ids.map(i => (s"$prefix$i", i.toLong)).toDF("url", "doc_id")

  private def exact(batch: org.apache.spark.sql.DataFrame,
      seen: org.apache.spark.sql.DataFrame) =
    batch.join(seen.select("url"), Seq("url"), "left_anti")
      .orderBy("doc_id").collect().toSeq

  test("output equals the plain left-anti join") {
    val seen = urls(0 until 400)
    val batch = urls(300 until 600) // 100 dups, 200 new
    val got = IncrementalDedup.newUrls(batch, seen)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
    assert(got.size == 200)
  }

  test("false positives cannot leak into the output") {
    // fpp near 1/2 forces plenty of false positives through the filter;
    // the exact join must eliminate every one
    val seen = urls(0 until 500)
    val batch = urls(450 until 1000)
    val got = IncrementalDedup.newUrls(batch, seen, fpp = 0.4)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
  }

  test("all-new and all-seen edges") {
    val seen = urls(0 until 100)
    val allNew = urls(100 until 150)
    assert(IncrementalDedup.newUrls(allNew, seen).count() == 50)
    val allSeen = urls(0 until 50)
    assert(IncrementalDedup.newUrls(allSeen, seen).count() == 0)
  }

  test("duplicate urls within the batch and within seen are preserved/handled") {
    // anti-join semantics: batch multiplicity preserved, seen
    // multiplicity irrelevant
    val seen = urls(Seq(1, 1, 2, 2, 3))
    val batch = urls(Seq(2, 4, 4))
    val got = IncrementalDedup.newUrls(batch, seen)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
    assert(got.map(_.getString(0)) ==
      Seq("https://example.com/p4", "https://example.com/p4"))
  }

  test("null urls in the batch are definitely-new (anti-join keeps them)") {
    val seen = urls(0 until 10)
    val batch = Seq((null: String, 100L), ("https://example.com/p5", 101L))
      .toDF("url", "doc_id")
    val got = IncrementalDedup.newUrls(batch, seen)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
    assert(got.size == 1 && got.head.isNullAt(0))
  }

  test("budget guard rejects an over-sized filter before building it") {
    val seen = urls(0 until 10)
    val batch = urls(5 until 15)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.newUrls(batch, seen,
        expectedSeen = 10_000_000_000L, filterBudgetBytes = 1L << 20)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("filter sizing formula matches the standard bloom bound") {
    // 10^6 items at 1% fpp ≈ 9.59 bits/item ≈ 1.2 MB
    val b = IncrementalDedup.filterBytes(1000000L, 0.01)
    assert(b > 1100000L && b < 1300000L)
  }
}
