package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{collapseWs, collapseWsStrip, digitGroups, isPyDigit,
  isRegexWordChar, isRegexWs, maxDigitRun, uPattern}

/** Differential fuzz: the hand-rolled hot-path primitives must be
  * EXACTLY the regex semantics they replaced (the byte-identity contract
  * rides on them) — for every BMP character. Supplementary-plane
  * divergence is a DOCUMENTED contract (graft.text package scaladoc),
  * pinned by an explicit test below rather than skipped silently. */
class RegexParitySpec extends AnyFunSuite {

  private val wsOne = uPattern("\\s")
  private val wsRun = uPattern("\\s+")
  private val digitOne = uPattern("\\d")
  private val digitRun = uPattern("\\d+")

  test("isRegexWs == regex \\s for every BMP char") {
    var c = 0
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch)) {
        val re = wsOne.matcher(String.valueOf(ch)).matches()
        assert(isRegexWs(ch) == re, f"char U+$c%04X")
      }
      c += 1
    }
  }

  test("isPyDigit == regex \\d for every BMP char") {
    var c = 0
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch)) {
        val re = digitOne.matcher(String.valueOf(ch)).matches()
        assert(isPyDigit(ch) == re, f"char U+$c%04X")
      }
      c += 1
    }
  }

  private val exotic = "a1 \t\nx  　 22٠۱" +
    "9-b  c  444 55555\r\n"

  private def randomStrings(n: Int): Seq[String] = {
    val r = new scala.util.Random(42)
    val alphabet = "ab1 23\t\n  -.,456789٠x  "
    (0 until n).map { _ =>
      val len = r.nextInt(40)
      new String(Array.fill(len)(alphabet(r.nextInt(alphabet.length))))
    } :+ "" :+ exotic
  }

  test("isRegexWordChar == regex \\w for every BMP char") {
    val wordOne = uPattern("\\w")
    var c = 0
    while (c <= 0xffff) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch)) {
        val re = wordOne.matcher(String.valueOf(ch)).matches()
        assert(isRegexWordChar(ch) == re, f"char U+$c%04X")
      }
      c += 1
    }
  }

  test("Confidence.countWords == word regex on fuzz strings") {
    val wordPattern = uPattern("\\b[a-zA-Z\u00e1\u00e9\u00ed\u00f3\u00fa" +
      "\u00fc\u00f1\u00c1\u00c9\u00cd\u00d3\u00da\u00dc\u00d1]{2,}\\b")
    val r = new scala.util.Random(7)
    val alphabet = "ab cde\u00e9\u00df12_ .,-\u0301x\tZ"
    val samples = (0 until 500).map { _ =>
      new String(Array.fill(r.nextInt(50))(alphabet(r.nextInt(alphabet.length))))
    } :+ "abc1 ab caf\u00e9 x yz_w 12ab a" :+ ""
    samples.foreach { s =>
      val m = wordPattern.matcher(s)
      var expected = 0
      while (m.find()) expected += 1
      assert(Confidence.countWords(s) == expected, s.map(_.toInt).mkString(","))
    }
  }

  test("collapseWs/collapseWsStrip == regex reference on fuzz strings") {
    randomStrings(500).foreach { s =>
      val expected = wsRun.matcher(s).replaceAll(" ")
      assert(collapseWs(s) == expected, s"collapseWs(${s.map(_.toInt)})")
      assert(collapseWsStrip(s) == expected.trim)
    }
  }

  test("digitGroups/maxDigitRun == regex reference on fuzz strings") {
    randomStrings(500).foreach { s =>
      val m = digitRun.matcher(s)
      val expected = List.newBuilder[String]
      while (m.find()) expected += m.group()
      val groups = expected.result()
      assert(digitGroups(s) == groups)
      val run = if (groups.isEmpty) 0 else groups.map(_.length).max
      assert(maxDigitRun(s) == run)
    }
  }

  test("field-extractor digit gates never change tryPatterns results") {
    // differential: gated vs gate-free (regex always runs)
    val defs = FieldExtractor.FieldDefinitions.values.flatten
      .flatMap(_.patterns).toList.distinct
    val texts = Seq(
      "DOB 12/05/1990 and card 4111 1111 1111 1111 exp 12/26",
      "no digits at all here just words",
      "short 12 34 runs only 5-6-7",
      "id AB123456 tax 123.456.789.01 phone 1234567",
      "MRZ P<UTOERIKSSON<<ANNA<MARIA<<<<<<<<<<<<<<<<<<<",
      "1111222233334444", "9", "", "4111-1111-1111-1111")
    texts.foreach { t =>
      val lower = t.toLowerCase
      val run = maxDigitRun(t)
      defs.foreach { g =>
        // gate-free result for ONE pattern
        val ungated = {
          val gateOk =
            if (g.mrzRun) true // mrz gate unchanged this round; skip
            else true
          if (gateOk) {
            val m = g.pattern.matcher(t)
            if (m.find())
              Some((if (m.groupCount() >= 1 && m.group(1) != null) m.group(1)
                    else m.group()).trim)
            else None
          } else None
        }
        val gated = FieldExtractor.tryPatternsLower(t, lower, List(g), run)
        // the gate may only prune NON-matching scans: if the regex DOES
        // match but the literal/mrz gate prunes it, that is pre-existing
        // gate behavior (gates are necessary conditions of the pattern);
        // the NEW digit gate must never prune a match
        if (g.minDigitRun > 0 && g.gates.isEmpty && !g.mrzRun)
          assert(gated == ungated,
            s"digit gate changed result for '${g.pattern.pattern()}' on '$t'")
      }
    }
  }

  test("sanitize digit gates: digit-rich spans still normalized") {
    // the 11-digit span rule still fires (gate must not suppress it)
    // NB: the reference span rule eats the span's trailing whitespace
    // (ocr_engine.py:327-337 quirk — part of the byte contract)
    val s = Sanitizer.sanitize("card 4111-1111-1111-1111 end")
    assert(s == "card 4111 1111 1111 1111end")
    // pair rule at exactly 6 digits
    assert(Sanitizer.sanitize("abc 123-456 def") == "abc 123 456 def")
    // trailing separator at exactly 3 digits
    assert(Sanitizer.sanitize("x 123- y") == "x 123 y")
    // below the gates: untouched
    assert(Sanitizer.sanitize("x 12-34 y") == "x 12-34 y")
  }

  test("supplementary-plane divergence is the documented BMP-only contract") {
    // U+1D7CE MATHEMATICAL BOLD DIGIT ZERO: Python \d (and Java's
    // code-point regex) match it; the per-char helpers see two
    // surrogates, neither a digit. This test PINS that divergence — if
    // the helpers ever go code-point-wide, update the package scaladoc
    // and flip these assertions deliberately.
    val astralDigit = new String(Character.toChars(0x1D7CE))
    assert(digitRun.matcher(astralDigit).find()) // the regex matches...
    assert(astralDigit.forall(!isPyDigit(_)))    // ...the char helper doesn't
    assert(graft.text.digitCount(astralDigit) == 0)
    assert(maxDigitRun(astralDigit) == 0)
    // BMP digits (including non-ASCII ones) agree with the regex
    val devanagariFive = '५'
    assert(isPyDigit(devanagariFive) &&
      digitRun.matcher(String.valueOf(devanagariFive)).find())
  }
}
