package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Classification + card analysis — mirrors
  * /root/reference/ocr_service/tests/test_personal_doc_extractor.py:16-93
  * and document_intelligence semantics. */
class CardIntelSpec extends AnyFunSuite {

  test("analyze returns bounded type_confidence") {
    val (_, conf, _) = CardIntel.analyze("Hello world")
    assert(conf >= 0.0 && conf <= 1.0)
  }

  test("classify passport") {
    val (t, c, _) =
      CardIntel.analyze("PASSPORT\nNationality: GBR\nPlace of birth: London\n")
    assert(t == "passport")
    assert(c >= 0.65)
  }

  test("classify driver license") {
    val (t, c, _) =
      CardIntel.analyze("Driving Licence\nCategories: B, C\nVehicle: car\n")
    assert(t == "driver_license")
    assert(c >= 0.65)
  }

  test("classify national id") {
    val (t, c, _) = CardIntel.analyze(
      "NATIONAL IDENTITY CARD\nDocumento Nacional de Identidad\n" +
        "Número de identificación: 12345678X")
    assert(t == "national_id")
    assert(c >= 0.65)
  }

  test("classify tax id") {
    val (t, c, _) =
      CardIntel.analyze("NIF: 12345678Z\nFiscal identification number\n")
    assert(t == "tax_id")
    assert(c >= 0.65)
  }

  test("classify utility bill") {
    val (t, c, _) = CardIntel.analyze(
      "Electricity Bill\nConsumption: 350 kWh\nService: suministro eléctrico\n")
    assert(t == "utility_bill")
    assert(c >= 0.65)
  }

  test("classify bank statement") {
    val (t, c, _) = CardIntel.analyze(
      "Bank Statement\nIBAN: DE89370400440532013000\nBalance: 1500.00\n")
    assert(t == "bank_statement")
    assert(c >= 0.65)
  }

  test("classify payslip") {
    val (t, c, _) = CardIntel.analyze(
      "Payslip\nNomina\nSalario: 2500.00\nEmployer: ACME Corp\n")
    assert(t == "payslip")
    assert(c >= 0.65)
  }

  test("classify employment letter") {
    val (t, c, _) = CardIntel.analyze(
      "Employment Letter\nTo Whom It May Concern\nEmployment at ACME Corp\n")
    assert(t == "employment_letter")
    assert(c >= 0.65)
  }

  test("generic document low confidence") {
    val (t, c, _) =
      CardIntel.analyze("Some random scanned text with no recognizable keywords.")
    assert(t == "generic_document")
    assert(c < 0.55)
  }

  test("luhn-valid card → bank_card 0.95") {
    val (t, c, _) = CardIntel.analyze("4111 1111 1111 1111")
    assert(t == "bank_card")
    assert(c == 0.95)
  }

  test("card candidates + keyword → bank_card 0.80") {
    // 12-digit candidate (not luhn-validatable at that length) + 'card' keyword
    val (t, c, cards) = CardIntel.analyze("card 4048 3700 0450")
    assert(cards.candidate_count == 1)
    assert(cards.luhn_valid_count == 0)
    assert(cards.requires_manual_review)
    assert(t == "bank_card")
    assert(c == 0.80)
  }

  test("invoice / receipt keywords") {
    assert(CardIntel.analyze("FACTURA No 443 subtotal 12")._1 == "invoice")
    assert(CardIntel.analyze("merchant: SHOP")._1 == "receipt")
  }

  test("layout fallbacks") {
    assert(CardIntel.classifyDocumentType("zzz", "dense_text",
      graft.model.CardAnalysis.empty) == (("statement", 0.60)))
    assert(CardIntel.classifyDocumentType("zzz", "large_blocks",
      graft.model.CardAnalysis.empty) == (("form", 0.55)))
    assert(CardIntel.classifyDocumentType("zzz", "unknown",
      graft.model.CardAnalysis.empty) == (("generic_document", 0.40)))
  }

  test("id keyword fallback") {
    val (t, c) = CardIntel.classifyDocumentType(
      "dni something", "unknown", graft.model.CardAnalysis.empty)
    assert(t == "id_document" || Set("passport", "national_id",
      "driver_license").contains(t))
    assert(c >= 0.55 && c <= 0.65)
  }

  test("candidate extraction dedups and bounds 11-19 digits") {
    val c = CardIntel.extractCardCandidates(
      "4111 1111 1111 1111 and again 4111-1111-1111-1111 plus 12345")
    assert(c == List("4111111111111111"))
  }

  test("masking keeps last 4, groups in 4s") {
    assert(CardIntel.maskNumber("4111111111111111") == "**** **** **** 1111")
    assert(CardIntel.maskNumber("1234") == "1234")
  }

  test("brand guessing") {
    assert(CardIntel.guessCardBrand("4111111111111111") == "visa")
    assert(CardIntel.guessCardBrand("378282246310005") == "amex")
    assert(CardIntel.guessCardBrand("5555555555554444") == "mastercard")
    assert(CardIntel.guessCardBrand("2221000000000009") == "mastercard")
    assert(CardIntel.guessCardBrand("6011111111111117") == "discover")
    assert(CardIntel.guessCardBrand("30569309025904") == "diners")
    assert(CardIntel.guessCardBrand("3530111333300000") == "jcb")
    assert(CardIntel.guessCardBrand("6200000000000005") == "unionpay")
    assert(CardIntel.guessCardBrand("9999999999999999") == "unknown")
  }
}
