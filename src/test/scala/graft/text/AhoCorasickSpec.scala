package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** AC presence must equal naive per-keyword `contains` — the reference's
  * scan semantics (document_intelligence.py:397-404). */
class AhoCorasickSpec extends AnyFunSuite {

  test("basic multi-pattern presence") {
    val ac = AhoCorasick.build(Vector("he", "she", "his", "hers", "p<"))
    val found = ac.matchedSet("ushers p<x")
    assert(found.toSeq == Seq(true, true, false, true, true))
  }

  test("overlapping and nested patterns") {
    val ac = AhoCorasick.build(Vector("a", "aa", "aaa", "ab"))
    assert(ac.matchedSet("aaa").toSeq == Seq(true, true, true, false))
    assert(ac.matchedSet("ab").toSeq == Seq(true, false, false, true))
    assert(ac.matchedSet("").toSeq == Seq(false, false, false, false))
  }

  test("property: AC presence == naive contains") {
    val kwGen = Gen.nonEmptyListOf(
      Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
      .map(_.distinct.toVector)
    val textGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(kwGen, textGen) { (kws, text) =>
        val ac = AhoCorasick.build(kws)
        val found = ac.matchedSet(text)
        kws.indices.forall(i => found(i) == text.contains(kws(i)))
      })
    assert(res.passed, res.status.toString)
  }
}
