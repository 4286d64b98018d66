package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** PiiScrub: replacement order, placeholder shapes, length bounds. */
class PiiScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pii-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(text: String): (String, Long, Long, Long) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val scrubbed = PiiScrub(df, "text").collect().head.getString(1)
    val r = PiiScrub.stats(df, "doc_id", "text").collect().head
    (scrubbed, r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("all three classes scrub to typed placeholders") {
    val (s, e, i, p) = run(
      "mail a.b+c@sub.example.org, host 192.168.1.20, call +4915112345678.")
    assert(s == "mail <EMAIL>, host <IP>, call <PHONE>.")
    assert((e, i, p) == (1L, 1L, 1L))
  }

  test("multiple occurrences all replaced, counted non-overlapping") {
    val (s, e, i, _) = run("x@y.ab then z@w.cd and 1.2.3.4 5.6.7.8")
    assert(s == "<EMAIL> then <EMAIL> and <IP> <IP>")
    assert(e == 2L && i == 2L)
  }

  test("order: digits inside an email are not re-matched as phone/ip") {
    // the email eats its whole span first; no <IP> appears inside it
    val (s, e, i, p) = run("u123@10.11.12.example more")
    assert(s == "<EMAIL> more")
    assert((e, i, p) == (1L, 0L, 0L))
  }

  test("phone length bounds: 6 digits no, 7 yes, 15 yes, 16 clips") {
    assert(run("+123456 x")._1 == "+123456 x")
    assert(run("+1234567 x")._1 == "<PHONE> x")
    assert(run("+123456789012345 x")._1 == "<PHONE> x")
    // 16 digits: the pattern takes its 15-digit maximum, one trails
    assert(run("+1234567890123456 x")._1 == "<PHONE>6 x")
  }

  test("clean text passes through untouched with zero counts") {
    val (s, e, i, p) = run("just prose with numbers 12 and dots. end")
    assert(s == "just prose with numbers 12 and dots. end")
    assert((e, i, p) == (0L, 0L, 0L))
  }
}
