package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mirrors /root/reference/ocr_service/tests/test_personal_doc_extractor.py:245-270
  * plus Luhn check-digit roundtrip property (SURVEY §5). */
class LuhnSpec extends AnyFunSuite {

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("known good Visa PAN passes") {
    assert(Luhn.isValidCardNumber("4111111111111111"))
  }
  test("last digit changed fails") {
    assert(!Luhn.isValidCardNumber("4111111111111112"))
  }
  test("non-digit string rejected") {
    assert(!Luhn.isValidCardNumber("4111-1111-1111-1111"))
  }
  test("too short rejected") {
    assert(!Luhn.isValidCardNumber("123456789012"))
  }
  test("too long rejected") {
    assert(!Luhn.isValidCardNumber("1" * 20))
  }
  test("Amex test PAN passes") {
    assert(Luhn.isValidCardNumber("378282246310005"))
  }
  test("luhnOk rejects empty/null") {
    assert(!Luhn.luhnOk(""))
    assert(!Luhn.luhnOk(null))
  }

  test("property: checkDigit roundtrip — body+check always luhnOk") {
    val bodyGen = Gen.chooseNum(12, 18).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    checkProp(Prop.forAll(bodyGen) { body =>
      Luhn.luhnOk(body + Luhn.checkDigit(body).toString)
    })
  }
}
