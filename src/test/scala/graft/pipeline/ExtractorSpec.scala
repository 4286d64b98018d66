package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.model.PageRow

class ExtractorSpec extends AnyFunSuite {

  private def page(html: Array[Byte], url: String = "https://h.example/1") =
    PageRow(url, new java.sql.Timestamp(1700000000000L), html, "", "en")

  test("empty input → FAILED status, no exception") {
    val r = Extractor.extract(page(Array.emptyByteArray))
    assert(r.status == "FAILED")
    assert(r.errors == Seq("EMPTY_INPUT"))
  }

  test("oversized input → FAILED SIZE_EXCEEDED") {
    val r = Extractor.extract(page(new Array[Byte](Extractor.MaxBytes + 1)))
    assert(r.status == "FAILED")
    assert(r.errors == Seq("SIZE_EXCEEDED"))
  }

  test("article page extracts main content, classifies generic") {
    val html = ("<html><head><title>T</title></head><body>" +
      "<nav><ul><li><a href='/'>Home</a></li></ul></nav>" +
      "<article><p>This is the central story content with many meaningful " +
      "words that should definitely survive the density classifier pass " +
      "and be preserved in the extracted output text for this page.</p>" +
      "<p>A second paragraph with plenty of additional words to make the " +
      "quality evaluator comfortably happy about this document text.</p>" +
      "</article><footer><a href='/t'>Terms</a></footer></body></html>").getBytes(UTF_8)
    val r = Extractor.extract(page(html))
    assert(r.status != "FAILED")
    assert(r.text.contains("central story content"))
    assert(!r.text.contains("Home"))
    assert(!r.text.contains("Terms"))
    assert(r.fallback_chain.head == "layer1:density_classifier")
  }

  test("card page detects PAN, masks candidates, extracts fields") {
    val r = new java.util.Random(7)
    val pan = PagesSynth.luhnPan(r, "4", 16)
    val html = (s"<html><body><div><p>VISA card</p><p>EXP 12/27</p>" +
      s"<p>JOHN SMITH</p><p>${pan.grouped(4).mkString(" ")}</p></div></body></html>")
      .getBytes(UTF_8)
    val res = Extractor.extract(page(html))
    assert(res.document_type == "bank_card")
    assert(res.type_confidence == 0.95)
    assert(res.card_analysis.detected)
    assert(res.card_analysis.luhn_valid_count == 1)
    assert(res.card_analysis.candidates.head.masked.endsWith(pan.takeRight(4)))
    assert(res.card_analysis.candidates.head.brand_guess == "visa")
    // field values masked; raw redacted
    val cardField = res.fields.find(_.name == "card_number")
    assert(cardField.isDefined)
    assert(cardField.get.raw_ocr == "[REDACTED]")
  }

  test("pdf routes through xycut and gets PAGE BREAK separators") {
    val row = PagesSynth.row(findRoll(91, 94)) // multi-page pdf class
    val res = Extractor.extract(row)
    assert(res.fallback_chain == Seq("pdf:xycut"))
    assert(res.text.contains("--- PAGE BREAK ---"))
    assert(res.status != "FAILED" || res.text.nonEmpty)
  }

  test("synthetic corpus: no extraction ever throws; statuses populated") {
    var i = 0L
    var okCount = 0
    while (i < 300) {
      val res = Extractor.extract(PagesSynth.row(i))
      assert(Set("OK", "PARTIAL", "FAILED").contains(res.status))
      if (res.status == "OK") okCount += 1
      i += 1
    }
    assert(okCount > 150, s"expected majority OK, got $okCount/300")
  }

  test("extraction is deterministic (same row → byte-identical text)") {
    var i = 0L
    while (i < 100) {
      val a = Extractor.extract(PagesSynth.row(i))
      val b = Extractor.extract(PagesSynth.row(i))
      assert(a.text == b.text)
      assert(a == b)
      i += 1
    }
  }

  test("invoice page classified as invoice with fields") {
    // find an invoice-class row (roll 40-47)
    val row = PagesSynth.row(findRoll(40, 48))
    val res = Extractor.extract(row)
    assert(res.document_type == "invoice")
    assert(res.type_confidence == 0.90)
    assert(res.fields.exists(_.name == "total_amount"))
  }

  test("bank statement classified with readiness analytics") {
    val row = PagesSynth.row(findRoll(60, 65))
    val res = Extractor.extract(row)
    assert(res.document_type == "bank_statement")
    assert(res.analytics.fields_expected_count == 2)
  }

  /** Find a synth row index whose class roll falls in [lo, hi). */
  private def findRoll(lo: Int, hi: Int): Long = {
    var i = 0L
    while (i < 10000) {
      val r = new java.util.Random(PagesSynth.Seed * 1000003L + i * 2654435761L)
      val roll = r.nextInt(100)
      if (roll >= lo && roll < hi) return i
      i += 1
    }
    fail(s"no row with roll in [$lo,$hi)")
  }
}
