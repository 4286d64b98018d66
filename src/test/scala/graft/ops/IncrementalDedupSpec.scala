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

  test("sharded bloom index: probe equals plain anti-join") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloomidx_").toString
    val seen = urls(0 until 700)
    val batch = urls(500 until 1200).repartition(5)
    val written = IncrementalDedup.writeBloomIndex(seen, dir, buckets = 8)
    assert(written > 0 && written <= 8)
    // files are named by bucket and committed (no temp dir left;
    // ignore Hadoop local-FS .crc sidecars and the _bloom_meta manifest)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(f => f.startsWith(".") || f.startsWith("_")).sorted
    assert(files.forall(f => f.matches("bloom-\\d{5}\\.bin")), files.toSeq)
    // probing with a different bucket count than the index was built
    // with must fail fast, not silently classify seen urls as new
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.newUrlsSharded(batch, seen, dir, buckets = 16).count()
    }
    assert(e.getMessage.contains("built with buckets=8"))
    val got = IncrementalDedup
      .newUrlsSharded(batch, seen, dir, buckets = 8)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
    assert(got.size == 500)
  }

  test("sharded probe: missing bucket files mean definitely-new") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloomidx2_").toString
    // empty seen: no filter files at all — every batch row is new
    val seen = urls(Seq.empty)
    val batch = urls(0 until 40)
    assert(IncrementalDedup.writeBloomIndex(seen, dir, buckets = 4) == 0L)
    val got = IncrementalDedup.newUrlsSharded(batch, seen, dir, buckets = 4)
    assert(got.count() == 40)
  }

  test("sharded probe keeps null urls and batch multiplicity") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloomidx3_").toString
    val seen = urls(0 until 50)
    IncrementalDedup.writeBloomIndex(seen, dir, buckets = 4)
    val batch = Seq((null: String, 900L), ("https://example.com/p3", 901L),
      ("https://example.com/p60", 902L), ("https://example.com/p60", 903L))
      .toDF("url", "doc_id")
    val got = IncrementalDedup.newUrlsSharded(batch, seen, dir, buckets = 4)
      .orderBy("doc_id").collect().toSeq
    assert(got == exact(batch, seen))
    assert(got.map(_.getLong(1)) == Seq(900L, 902L, 903L))
  }

  test("build and probe agree on bucket for every url (partition pinning)") {
    // byte-deterministic index: rebuilding from a differently-partitioned
    // seen frame yields identical filter files
    val dir1 = java.nio.file.Files
      .createTempDirectory("graft_bloomidx4_").toString
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_bloomidx5_").toString
    val seen = urls(0 until 300)
    IncrementalDedup.writeBloomIndex(seen.repartition(7), dir1, buckets = 8)
    IncrementalDedup.writeBloomIndex(seen.repartition(2), dir2, buckets = 8)
    val f1 = new java.io.File(dir1).listFiles().sortBy(_.getName)
    val f2 = new java.io.File(dir2).listFiles().sortBy(_.getName)
    assert(f1.map(_.getName).toSeq == f2.map(_.getName).toSeq)
    f1.zip(f2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(a.toPath),
        java.nio.file.Files.readAllBytes(b.toPath)), a.getName)
    }
  }
}
