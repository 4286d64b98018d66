package graft.html

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class HtmlKernelSpec extends AnyFunSuite {

  private def seg(html: String): Segmentation =
    BlockSegmenter.segment(HtmlTokenizer.parseString(html))

  test("utf8-ignore decode drops invalid bytes, keeps valid multibyte") {
    val good = "café".getBytes(UTF_8)
    val mixed = good ++ Array(0xfe.toByte, 0xff.toByte) ++ "ok".getBytes(UTF_8)
    assert(HtmlTokenizer.decodeUtf8Ignore(mixed) == "caféok")
    assert(HtmlTokenizer.decodeUtf8Ignore(Array.emptyByteArray) == "")
    // BOM skipped
    assert(HtmlTokenizer.decodeUtf8Ignore(
      Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "x".getBytes(UTF_8)) == "x")
  }

  test("basic block segmentation and text") {
    val s = seg("<html><body><p>Hello world</p><p>Second block</p></body></html>")
    assert(s.blocks.map(_.text) == Vector("Hello world", "Second block"))
  }

  test("entities decoded") {
    val s = seg("<p>a &amp; b &lt;c&gt; &#65; &#x42; caf&eacute;</p>")
    assert(s.blocks.head.text == "a & b <c> A B café")
  }

  test("script/style/comments dropped, title captured") {
    val s = seg("<html><head><title>My Title</title><style>p{}</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body><!-- comment --><p>Real</p></body></html>")
    assert(s.title == "My Title")
    assert(s.blocks.map(_.text) == Vector("Real"))
  }

  test("inline tags don't split blocks; word boundaries preserved") {
    val s = seg("<p><b>foo</b> <i>bar</i>baz</p>")
    assert(s.blocks.head.text == "foo barbaz")
  }

  test("link chars counted for density") {
    val s = seg("""<p><a href="/x">link text here</a> and some plain words</p>""")
    val b = s.blocks.head
    assert(b.linkChars > 0 && b.linkChars < b.chars)
    val farm = seg("""<li><a href="/1">one</a></li>""")
    assert(farm.blocks.head.linkDensity >= 0.99)
  }

  test("nav/header/footer marked boilerplate") {
    val s = seg("<nav><li>Home</li></nav><div><p>Content body text</p></div>" +
      "<footer><p>Terms</p></footer>")
    val blocks = s.blocks
    assert(blocks.exists(b => b.inBoiler && b.text == "Home"))
    assert(blocks.exists(b => !b.inBoiler && b.text == "Content body text"))
    assert(blocks.exists(b => b.inBoiler && b.text == "Terms"))
  }

  test("malformed html never throws; unclosed tags tolerated") {
    assert(seg("<p>unclosed <b>bold").blocks.head.text == "unclosed bold")
    assert(seg("</div></p><p>stray closes</p>").blocks.nonEmpty)
    assert(seg("<p>a < b and > c</p>").blocks.nonEmpty)
    seg("") // empty ok
    val garbage = new String(Array.fill(100)(0xfe.toByte).map(_.toChar))
    seg(garbage)
  }

  test("density classifier keeps article, drops chrome and link farms") {
    val html =
      """<header><nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav></header>""" +
        "<article><h2>Headline here</h2>" +
        "<p>This is the main article content with enough words to be " +
        "considered a proper paragraph of running text for the classifier.</p>" +
        "<p>Another long paragraph with plenty of words inside it to pass " +
        "the density threshold easily and stay in the output text.</p></article>" +
        """<footer><p><a href="/t">Terms</a> | <a href="/p">Privacy</a></p></footer>"""
    val s = seg(html)
    val main = ContentClassifier.assemble(ContentClassifier.mainContent(s.blocks))
    assert(main.contains("main article content"))
    assert(main.contains("Headline here")) // heading absorbed
    assert(!main.contains("Home"))
    assert(!main.contains("Terms"))
  }

  test("layout classification thresholds") {
    val dense = (1 to 25).map(i => s"<p>w$i</p>").mkString
    assert(seg(dense).layoutType == "dense_text")
    val large = "<p>" + ("x" * 500) + "</p><p>y</p>"
    assert(seg(large).layoutType == "large_blocks")
    assert(seg("").layoutType == "empty")
  }

  test("dom arena parent/child vectors consistent") {
    val dom = HtmlTokenizer.parseString("<div><p>a</p><p>b</p></div>")
    var i = 0
    while (i < dom.size) {
      val fc = dom.firstChild(i)
      if (fc != DomArena.NoNode) assert(dom.parent(fc) == i)
      val ns = dom.nextSibling(i)
      if (ns != DomArena.NoNode) assert(dom.parent(ns) == dom.parent(i))
      i += 1
    }
  }
}
