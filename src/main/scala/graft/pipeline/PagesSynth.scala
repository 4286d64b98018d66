package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import graft.model.PageRow

/** Deterministic synthetic pages corpus (FIXTURES.md §1).
  *
  * Schema per BASELINE.json input_hint: (url, warc_ts, html, text, lang).
  * Row i is generated independently from seed⊕i (order- and
  * partitioning-independent — safe to generate distributed). Hosts cycle
  * mod [[Hosts]] so several are hot, exercising the salted-repartition
  * skew path. No wall-clock, no external data.
  */
object PagesSynth {

  val Seed = 42L
  val Hosts = 13
  private val Langs = Array("en", "es", "fr", "de", "pt")

  private val EpochBase = 1700000000000L // fixed; no now()

  private val Words = Array(
    "market", "report", "growth", "policy", "science", "energy", "travel",
    "culture", "health", "finance", "design", "nature", "history", "music",
    "economy", "climate", "research", "industry", "network", "analysis",
    "digital", "global", "system", "public", "private", "modern", "simple",
    "complex", "signal", "measure", "method", "result", "impact", "region",
    "sector", "supply", "demand", "capital", "product", "service")

  private def sentence(r: java.util.Random, words: Int): String = {
    val sb = new java.lang.StringBuilder(words * 8)
    var i = 0
    while (i < words) {
      val w = Words(r.nextInt(Words.length))
      if (i == 0) {
        sb.append(Character.toUpperCase(w.charAt(0))).append(w.substring(1))
      } else sb.append(' ').append(w)
      i += 1
    }
    sb.append('.').toString
  }

  private def paragraph(r: java.util.Random, sentences: Int): String =
    (0 until sentences).map(_ => sentence(r, 8 + r.nextInt(10))).mkString(" ")

  private def boilerplate(r: java.util.Random): (String, String) = {
    val nav = """<nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>""" +
      """<li><a href="/about">About</a></li><li><a href="/contact">Contact</a></li></ul></nav>"""
    val footer = """<footer><p><a href="/terms">Terms</a> | <a href="/privacy">Privacy</a>""" +
      """ | <a href="/cookies">Cookies</a> © 2024 Example Corp</p></footer>"""
    (s"<header><h1>Example Site</h1>$nav</header>", footer)
  }

  private def wrap(r: java.util.Random, title: String, body: String): String = {
    val (header, footer) = boilerplate(r)
    s"""<!DOCTYPE html><html><head><title>$title</title>""" +
      """<meta charset="utf-8"><style>body{margin:0}</style>""" +
      """<script>var x=1;</script></head><body>""" +
      header + s"""<main>$body</main>""" + footer + "</body></html>"
  }

  // -- corpus classes (FIXTURES.md §1) ------------------------------------

  // sizes approximate Common-Crawl-scale pages (mean ~8 KB of html):
  // per-row overhead (encode/shuffle/task) must be amortized the way it
  // would be on the real corpus.
  private def article(r: java.util.Random): String = {
    val paras = (0 until 10 + r.nextInt(10))
      .map(_ => s"<p>${paragraph(r, 5 + r.nextInt(5))}</p>").mkString
    wrap(r, "Article " + sentence(r, 3), s"<article><h2>${sentence(r, 4)}</h2>$paras</article>")
  }

  private def linkFarm(r: java.util.Random): String = {
    val links = (0 until 60 + r.nextInt(60))
      .map(i => s"""<li><a href="/p/$i">${sentence(r, 3)}</a></li>""").mkString
    val content = s"<p>${paragraph(r, 6)}</p>"
    wrap(r, "Directory", s"<div><ul>$links</ul>$content<ul>$links</ul></div>")
  }

  private def invoice(r: java.util.Random): String = {
    val items = (0 until 4 + r.nextInt(4)).map { i =>
      f"<tr><td>Item ${i + 1} ${Words(r.nextInt(Words.length))}</td><td>${(r.nextInt(9000) + 100) / 100.0}%.2f</td></tr>"
    }.mkString
    val total = f"${(r.nextInt(90000) + 1000) / 100.0}%.2f"
    wrap(r, "Invoice",
      s"""<div><h2>INVOICE</h2><p>Invoice No: INV-${1000 + r.nextInt(9000)}</p>""" +
        s"""<p>Issue Date: ${1 + r.nextInt(28)}/0${1 + r.nextInt(9)}/2024</p>""" +
        s"""<table>$items</table><p>Subtotal: $$${total}</p>""" +
        s"""<p>IVA: $$${f"${(r.nextInt(9000) + 100) / 100.0}%.2f"}</p>""" +
        s"""<p>Total Amount: $$${total}</p></div>""")
  }

  private def receipt(r: java.util.Random): String = {
    val items = (0 until 3 + r.nextInt(5))
      .map(i => f"<p>item${i + 1} ${Words(r.nextInt(Words.length))} ${(r.nextInt(2000) + 50) / 100.0}%.2f</p>").mkString
    wrap(r, "Receipt",
      s"""<div><h2>RECEIPT</h2><p>Merchant: STORE ${r.nextInt(99)}</p>""" +
        s"""<p>Terminal: T${r.nextInt(999)}</p>$items""" +
        f"""<p>Total: $$${(r.nextInt(9000) + 100) / 100.0}%.2f</p></div>""")
  }

  private def passport(r: java.util.Random): String = {
    wrap(r, "Passport scan",
      s"""<div><h2>PASSPORT</h2><p>Surname: SMITH${r.nextInt(99)}</p>""" +
        """<p>Given Names: JOHN</p><p>Nationality: GBR</p>""" +
        s"""<p>Date of Birth: ${1 + r.nextInt(28)}/0${1 + r.nextInt(9)}/19${70 + r.nextInt(29)}</p>""" +
        s"""<p>Passport No: AB${100000 + r.nextInt(899999)}</p>""" +
        s"""<p>Date of Expiry: ${1 + r.nextInt(28)}/0${1 + r.nextInt(9)}/20${28 + r.nextInt(9)}</p>""" +
        """<p>Place of Birth: LONDON</p></div>""")
  }

  private def bankStatement(r: java.util.Random): String = {
    val txns = (0 until 20 + r.nextInt(25)).map { i =>
      f"<p>0${1 + r.nextInt(9)}/0${1 + r.nextInt(9)}/2024 payment ${Words(r.nextInt(Words.length))} ${(r.nextInt(90000) + 100) / 100.0}%.2f</p>"
    }.mkString
    wrap(r, "Statement",
      s"""<div><h2>BANK STATEMENT</h2><p>Account Holder: ALICE BROWN</p>""" +
        s"""<p>Account Number: GB${10 + r.nextInt(89)}BARC${20000000 + r.nextInt(9999999)}</p>""" +
        f"""<p>Opening Balance: $$${(r.nextInt(900000) + 1000) / 100.0}%.2f</p>$txns""" +
        f"""<p>Closing Balance: $$${(r.nextInt(900000) + 1000) / 100.0}%.2f</p>""" +
        """<p>USD 100 USD 250 transactions included</p></div>""")
  }

  private def payslip(r: java.util.Random): String = {
    wrap(r, "Payslip",
      s"""<div><h2>PAYSLIP</h2><p>Employee: CARLA JONES</p>""" +
        """<p>Employer: ACME Corp</p>""" +
        f"""<p>Gross Pay: $$${(300000 + r.nextInt(400000)) / 100.0}%.2f</p>""" +
        f"""<p>Net Pay: $$${(200000 + r.nextInt(300000)) / 100.0}%.2f</p>""" +
        """<p>Pay Period: March 2024</p><p>Deductions: tax, payroll</p></div>""")
  }

  private def utilityBill(r: java.util.Random): String = {
    wrap(r, "Utility bill",
      s"""<div><h2>ELECTRICITY BILL</h2><p>Full Name: JANE DOE</p>""" +
        """<p>Address: 123 Main Street, Springfield</p>""" +
        s"""<p>Account Number: ACC-${1000000000L + r.nextInt(999999999)}</p>""" +
        s"""<p>Meter Reading: ${r.nextInt(99999)} kWh consumption</p>""" +
        """<p>Period: January 2024</p>""" +
        f"""<p>Total Amount: $$${(r.nextInt(40000) + 500) / 100.0}%.2f</p></div>""")
  }

  /** Luhn-valid PAN with the given prefix and length. */
  private[pipeline] def luhnPan(r: java.util.Random, prefix: String, len: Int): String = {
    val body = new java.lang.StringBuilder(prefix)
    while (body.length() < len - 1) body.append(r.nextInt(10))
    body.toString + graft.text.Luhn.checkDigit(body.toString)
  }

  private def cardPage(r: java.util.Random): String = {
    val pan = luhnPan(r, "4", 16)
    val grouped = pan.grouped(4).mkString(" ")
    // PAN last: sanitize's digit-span rule eats the span's trailing
    // whitespace (reference parity), so a PAN followed by a letter block
    // would defeat the \b-anchored PAN field pattern — in both engines.
    // EXP kept away from the PAN too: sanitize's span rule merges nearby
    // digit groups across "/" separators (11-19-digit window), again
    // mirroring the reference regex.
    wrap(r, "Card",
      s"""<div><h2>VISA card</h2>""" +
        s"""<p>EXP 0${1 + r.nextInt(9)}/2${6 + r.nextInt(3)}</p>""" +
        s"""<p>JOHN SMITH</p><p>$grouped</p></div>""")
  }

  private def noisy(r: java.util.Random): String = {
    // control chars exercise the sanitizer's allowed-char filter (T1)
    val junk = "4048-3700-0450 \u0007\u0001 " + paragraph(r, 8) +
      " 4111.1111.1111.1111 " + ("x" * (r.nextInt(800) + 200))
    val paras = (0 until 6).map(_ => s"<p>${paragraph(r, 6)}</p>").mkString
    wrap(r, "Noisy", s"<div><p>$junk</p>$paras</div>")
  }

  // -- PDFs ----------------------------------------------------------------

  private def pdfBytes(pages: List[List[(Double, Double, String)]]): Array[Byte] = {
    val sb = new java.lang.StringBuilder("%PDF-1.4\n")
    var objNum = 1
    pages.foreach { runs =>
      val content = new java.lang.StringBuilder("BT /F1 12 Tf\n")
      runs.foreach { case (x, y, s) =>
        val esc = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        content.append(f"1 0 0 1 $x%.0f $y%.0f Tm ($esc) Tj\n")
      }
      content.append("ET\n")
      sb.append(s"$objNum 0 obj << /Length ${content.length()} >>\nstream\n")
        .append(content).append("endstream\nendobj\n")
      objNum += 1
    }
    sb.append("%%EOF\n")
    sb.toString.getBytes(UTF_8)
  }

  private def pdfSingleColumn(r: java.util.Random): Array[Byte] = {
    val lines = (0 until 30 + r.nextInt(15)).map { i =>
      (72.0, 720.0 - i * 14, sentence(r, 6 + r.nextInt(5)))
    }.toList
    pdfBytes(List(lines))
  }

  private def pdfTwoColumn(r: java.util.Random): Array[Byte] = {
    val left = (0 until 30).map(i => (72.0, 720.0 - i * 14, sentence(r, 4)))
    val right = (0 until 30).map(i => (340.0, 720.0 - i * 14, sentence(r, 4)))
    pdfBytes(List((left ++ right).toList))
  }

  private def pdfMultiPage(r: java.util.Random): Array[Byte] = {
    val mk = () => (0 until 20).map(i =>
      (72.0, 720.0 - i * 14, sentence(r, 5))).toList
    pdfBytes(List(mk(), mk(), mk()))
  }

  // -- malformed ----------------------------------------------------------

  private def malformed(r: java.util.Random, kind: Int): Array[Byte] = kind match {
    case 0 => Array.emptyByteArray
    case 1 => // truncated html
      article(r).getBytes(UTF_8).take(40 + r.nextInt(100))
    case 2 => // invalid UTF-8 interleaved
      val good = article(r).getBytes(UTF_8)
      val bad = good.clone()
      var i = 20
      while (i < bad.length) { bad(i) = 0xfe.toByte; i += 97 }
      bad
    case _ => // binary garbage
      val a = new Array[Byte](256 + r.nextInt(512))
      r.nextBytes(a)
      a
  }

  // -- row assembly ---------------------------------------------------------

  /** Class mix: 30% article, 10% link farm, 8% invoice, 7% receipt,
    * 5% each personal doc class, 5% card, 5% noisy, 9% PDFs, 6% malformed. */
  def row(i: Long): PageRow = {
    val r = new java.util.Random(Seed * 1000003L + i * 2654435761L)
    val roll = r.nextInt(100)
    val html: Array[Byte] =
      if (roll < 30) article(r).getBytes(UTF_8)
      else if (roll < 40) linkFarm(r).getBytes(UTF_8)
      else if (roll < 48) invoice(r).getBytes(UTF_8)
      else if (roll < 55) receipt(r).getBytes(UTF_8)
      else if (roll < 60) passport(r).getBytes(UTF_8)
      else if (roll < 65) bankStatement(r).getBytes(UTF_8)
      else if (roll < 70) payslip(r).getBytes(UTF_8)
      else if (roll < 75) utilityBill(r).getBytes(UTF_8)
      else if (roll < 80) cardPage(r).getBytes(UTF_8)
      else if (roll < 85) noisy(r).getBytes(UTF_8)
      else if (roll < 88) pdfSingleColumn(r)
      else if (roll < 91) pdfTwoColumn(r)
      else if (roll < 94) pdfMultiPage(r)
      else malformed(r, r.nextInt(4))

    PageRow(
      url = s"https://host${i % Hosts}.example/path/$i",
      warc_ts = new java.sql.Timestamp(EpochBase + i * 1000L),
      html = html,
      text = "", // raw side-channel unused by the engine (FIXTURES.md §1)
      lang = Langs((i % Langs.length).toInt))
  }
}
