package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class PdfKernelSpec extends AnyFunSuite {

  private def pdf(content: String): Array[Byte] =
    (s"%PDF-1.4\n1 0 obj << /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF\n").getBytes(UTF_8)

  test("magic-byte detection") {
    assert(PdfParser.isPdf("%PDF-1.4".getBytes(UTF_8)))
    assert(!PdfParser.isPdf("<html>".getBytes(UTF_8)))
    assert(!PdfParser.isPdf(Array.emptyByteArray))
    assert(!PdfParser.isPdf(null))
  }

  test("single column reads top to bottom") {
    val content = "BT /F1 12 Tf 72 720 Td (First line) Tj " +
      "0 -14 Td (Second line) Tj 0 -14 Td (Third line) Tj ET"
    val text = PdfParser.extractText(pdf(content))
    assert(text == "First line\nSecond line\nThird line")
  }

  test("two columns read left column first") {
    val content = "BT /F1 12 Tf " +
      "1 0 0 1 72 720 Tm (L one) Tj 1 0 0 1 72 706 Tm (L two) Tj " +
      "1 0 0 1 400 720 Tm (R one) Tj 1 0 0 1 400 706 Tm (R two) Tj ET"
    val text = PdfParser.extractText(pdf(content))
    assert(text == "L one\nL two\nR one\nR two")
  }

  test("TJ arrays and escapes") {
    val content = "BT /F1 12 Tf 72 720 Td [(Hel) (lo)] TJ " +
      "0 -14 Td (paren \\( ok \\)) Tj ET"
    val text = PdfParser.extractText(pdf(content))
    assert(text.startsWith("Hello"))
    assert(text.contains("paren ( ok )"))
  }

  test("hex strings decoded") {
    val content = "BT /F1 12 Tf 72 720 Td <48 65 6C 6C 6F> Tj ET"
    assert(PdfParser.extractText(pdf(content)) == "Hello")
  }

  test("multi-page joined with PAGE BREAK separator") {
    val c1 = "BT /F1 12 Tf 72 720 Td (Page one) Tj ET"
    val c2 = "BT /F1 12 Tf 72 720 Td (Page two) Tj ET"
    val bytes = (s"%PDF-1.4\n" +
      s"1 0 obj << /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      s"2 0 obj << /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) ==
      "Page one\n\n--- PAGE BREAK ---\n\nPage two")
  }

  test("FlateDecode streams inflated") {
    val content = "BT /F1 12 Tf 72 720 Td (Compressed hello) Tj ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(content.getBytes(UTF_8)); deflater.finish()
    val buf = new Array[Byte](4096)
    val n = deflater.deflate(buf)
    val compressed = java.util.Arrays.copyOf(buf, n)
    val bytes = ("%PDF-1.4\n1 0 obj << /Length " + n +
      " /Filter /FlateDecode >>\nstream\n").getBytes(UTF_8) ++ compressed ++
      "\nendstream\nendobj\n%%EOF\n".getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) == "Compressed hello")
  }

  test("quote operator advances line") {
    val content = "BT /F1 12 Tf 14 TL 72 720 Td (a) Tj (b) ' ET"
    assert(PdfParser.extractText(pdf(content)) == "a\nb")
  }

  test("page tree: one page split across two content streams is ONE page") {
    val c1 = "BT /F1 12 Tf 72 720 Td (Top half) Tj ET"
    val c2 = "BT /F1 12 Tf 72 700 Td (Bottom half) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n" +
      s"4 0 obj << /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      s"5 0 obj << /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    // no PAGE BREAK: both streams belong to page 3
    assert(PdfParser.extractText(bytes) == "Top half\nBottom half")
  }

  test("page tree: kid order wins over object order") {
    val c1 = "BT /F1 12 Tf 72 720 Td (Second in file, first in tree) Tj ET"
    val c2 = "BT /F1 12 Tf 72 720 Td (First in file, second in tree) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [6 0 R 3 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n" +
      s"5 0 obj << /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      "6 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) ==
      "Second in file, first in tree\n\n--- PAGE BREAK ---\n\n" +
        "First in file, second in tree")
  }

  test("CID hex strings map through ToUnicode; unmapped becomes U+FFFD") {
    // ToUnicode CMap: CID 0001->H, 0002->i, range 0010..0012 -> a,b,c
    val cmap = "/CIDInit /ProcSet findresource begin begincmap\n" +
      "2 beginbfchar\n<0001> <0048>\n<0002> <0069>\nendbfchar\n" +
      "1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n" +
      "endcmap end"
    val content = "BT /F1 12 Tf 72 720 Td <0001 0002> Tj " +
      "0 -14 Td <0010 0011 0012> Tj 0 -14 Td <0001 00FF> Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    val text = PdfParser.extractText(bytes)
    assert(text == "Hi\nabc\nH�", text.map(_.toInt).mkString(","))
  }

  test("WinAnsi /Encoding decodes cp1252 bytes (accented text, typography)") {
    // 0xE9 = é in cp1252; 0x93/0x94 = curly quotes; 0x85 = ellipsis
    val content =
      "BT /F1 12 Tf 72 720 Td (caf\u00e9 \u0093ok\u0094\u0085) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helv " +
      "/Encoding /WinAnsiEncoding >> endobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val text = PdfParser.extractText(bytes)
    assert(text == "café “ok”…", text.map(_.toInt).mkString(","))
  }

  test("/Differences remaps codes over the base encoding") {
    // code 65 ('A') → eacute, 66 ('B') → Euro via uni20AC, 67 stays 'C'
    val content = "BT /F1 12 Tf 72 720 Td (ABC) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type1 /Encoding 6 0 R >> endobj\n" +
      "6 0 obj << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 65 /eacute 66 /uni20AC ] >> endobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) == "é€C")
  }

  test("unencoded fonts keep byte-identity (no /Encoding, no table)") {
    val content = "BT /F1 12 Tf 72 720 Td (plain ascii) Tj ET"
    assert(PdfParser.extractText(pdf(content)) == "plain ascii")
  }

  test("bfrange array form maps each code to its own target") {
    val cmap = "begincmap\n" +
      "1 beginbfrange\n<0005> <0007> [<0058> <0059> <005A>]\nendbfrange\n" +
      "1 beginbfrange\n<0020> <0021> <0030>\nendbfrange\nendcmap"
    val content = "BT /F1 12 Tf 72 720 Td <0005 0006 0007 0020 0021> Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) == "XYZ01")
  }

  test("phantom 'obj' bytes inside stream payloads create no objects") {
    // the payload spells "7 0 obj << /Type /Page ..." — a naive scanner
    // would register object 7 and corrupt the page set
    val trap = "7 0 obj << /Type /Page /Contents 9 0 R >> endobj"
    val content = "BT /F1 12 Tf 72 720 Td (real page) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"5 0 obj << /Length ${trap.length} >>\nstream\n$trap\nendstream\nendobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(UTF_8)
    assert(PdfParser.extractText(bytes) == "real page")
  }

  test("per-page /Resources scope font tables (simple /F1 vs Type0 /F1)") {
    // page 1 binds /F1 to a WinAnsi simple font; page 2 binds the SAME
    // name to a Type0 CID font — a document-wide first-binding-wins
    // table would byte-decode page 2's 2-byte CID hex into mojibake
    val cmap = "begincmap\n2 beginbfchar\n<0001> <0048>\n<0002> <0069>\n" +
      "endbfchar\nendcmap"
    val c1 = "BT /F1 12 Tf 72 720 Td (café) Tj ET" // 0xE9 = WinAnsi é
    val c2 = "BT /F1 12 Tf 72 720 Td <0001 0002> Tj ET" // CIDs → "Hi"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 7 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /TrueType " +
      "/Encoding /WinAnsiEncoding >> endobj\n" +
      "7 0 obj << /Type /Page /Parent 2 0 R /Contents 8 0 R " +
      "/Resources << /Font << /F1 9 0 R >> >> >> endobj\n" +
      s"8 0 obj << /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n" +
      "9 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H " +
      "/ToUnicode 10 0 R >> endobj\n" +
      s"10 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val text = PdfParser.extractText(bytes)
    assert(text == "café\n\n--- PAGE BREAK ---\n\nHi",
      text.map(_.toInt).mkString(","))
  }

  test("indirect /Resources and indirect /Font dicts resolve") {
    val content = "BT /F1 12 Tf 72 720 Td (café) Tj ET"
    val bytes = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources 6 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "6 0 obj << /Font 7 0 R >> endobj\n" +
      "7 0 obj << /F1 5 0 R >> endobj\n" +
      "5 0 obj << /Type /Font /Subtype /TrueType " +
      "/Encoding /WinAnsiEncoding >> endobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfParser.extractText(bytes) == "café")
  }

  test("garbage never throws") {
    assert(PdfParser.extractText("%PDF-1.4 garbage".getBytes(UTF_8)) == "")
    val r = new java.util.Random(1)
    val junk = new Array[Byte](1024)
    r.nextBytes(junk)
    junk(0) = '%'; junk(1) = 'P'; junk(2) = 'D'; junk(3) = 'F'; junk(4) = '-'
    PdfParser.extractText(junk) // must not throw
  }
}
