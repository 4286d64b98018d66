package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mirrors /root/reference/ocr_service/tests/test_personal_doc_extractor.py:95-320. */
class FieldExtractorSpec extends AnyFunSuite {

  private def names(fs: Seq[graft.model.FieldRow]) = fs.map(_.name).toSet

  test("extract passport fields") {
    val text = "PASSPORT\nSurname: SMITH\nGiven Names: JOHN\nNationality: GBR\n" +
      "Date of Birth: 15/03/1985\nPassport No: AB123456\nDate of Expiry: 25/09/2030\n"
    val (fields, _) = FieldExtractor.extract(text, "passport")
    val n = names(fields)
    assert(n.contains("date_of_birth"))
    assert(n.contains("document_number"))
    assert(n.contains("nationality"))
    assert(n.contains("expiry_date"))
  }

  test("extract id_document fields") {
    val text = "IDENTITY CARD\nDNI: 12345678X\nJUAN PÉREZ GARCÍA\n" +
      "Date of Birth: 12/05/1990\nExpiry: 01/01/2030\n"
    val (fields, _) = FieldExtractor.extract(text, "id_document")
    assert(names(fields).contains("document_number"))
    assert(names(fields).contains("date_of_birth"))
  }

  test("bank card PAN is masked, raw redacted") {
    val text = "VISA\n4111 1111 1111 1111\nJOHN SMITH\nEXP 12/26\n"
    val (fields, _) = FieldExtractor.extract(text, "bank_card")
    val card = fields.find(_.name == "card_number").get
    assert(card.value.contains("1111"))
    assert(!card.value.contains("4111 1111 1111 1111"))
    assert(card.raw_ocr == "[REDACTED]")
    assert(card.value == "**** **** **** 1111")
  }

  test("CVV omitted from response") {
    val text = "4111 1111 1111 1111\nCVV 123\nEXP 12/26\n"
    val (fields, _) = FieldExtractor.extract(text, "bank_card")
    assert(!fields.exists(f => Set("cvv", "cvc", "cvv2", "cvc2").contains(f.name)))
  }

  test("generic document returns no fields") {
    val (fields, warnings) =
      FieldExtractor.extract("Some generic text", "generic_document")
    assert(fields.isEmpty && warnings.isEmpty)
  }

  test("utility bill fields") {
    val text = "ELECTRICITY BILL\nFull Name: JANE DOE\nAddress: 123 Main Street\n" +
      "Account Number: ACC-9876543210\nPay Period: January 2024\nTotal Amount: $150.00\n"
    val (fields, _) = FieldExtractor.extract(text, "utility_bill")
    assert(names(fields).contains("total_amount") || names(fields).contains("period"))
  }

  test("payslip fields") {
    val text = "PAYSLIP\nEmployee: ALICE JONES\nEmployer: ACME Corp\n" +
      "Gross Pay: $5,000.00\nPay Period: March 2024\n"
    val (fields, _) = FieldExtractor.extract(text, "payslip")
    assert(names(fields).contains("employer") || names(fields).contains("salary"))
  }

  test("ambiguous '?' chars force low confidence") {
    val (fields, warnings) = FieldExtractor.extract("DNI: 1234?678X\n", "id_document")
    val doc = fields.find(_.name == "document_number").get
    assert(doc.confidence_level == "low")
    assert(warnings.exists(_.contains("low confidence")))
  }

  test("detect metadata Spanish") {
    assert(LangHints.detect(
      "Apellido: GARCIA\nNombre: JUAN\nFecha de nacimiento: 12/05/1990")._1 == "es")
  }
  test("detect metadata English fallback") {
    assert(LangHints.detect(
      "Surname: Smith Given Names: John Date of Birth: 15/03/1985") == (("en", "")))
  }
  test("detect metadata Brazil") {
    assert(LangHints.detect("CPF: 123.456.789-00\nNome: Maria Silva") == (("pt", "BR")))
  }

  test("tax id fields") {
    val (fields, _) =
      FieldExtractor.extract("NIF: A1234567B\nFull Name: CARLOS LOPEZ\n", "tax_id")
    assert(names(fields).contains("tax_number"))
  }

  test("driver license fields") {
    val text = "DRIVING LICENCE\nSurname: BROWN\nGiven Names: EMILY\n" +
      "Date of Birth: 01/06/1992\nExpiry: 01/06/2032\nAddress: 42 Oak Lane, London\n"
    val (fields, _) = FieldExtractor.extract(text, "driver_license")
    assert(names(fields).contains("date_of_birth"))
    assert(names(fields).contains("expiry_date"))
  }

  test("Luhn-valid card boosts confidence to high with note") {
    val (fields, warnings) = FieldExtractor.extract(
      "VISA\n4111 1111 1111 1111\nJOHN SMITH\nEXP 12/26\n", "bank_card")
    val card = fields.find(_.name == "card_number").get
    assert(card.confidence_level == "high")
    assert(warnings.exists(_.contains("Luhn check passed")))
  }

  test("Luhn-invalid card lowers confidence to low with warning") {
    val (fields, warnings) = FieldExtractor.extract(
      "VISA\n4111 1111 1111 1112\nJOHN SMITH\nEXP 12/26\n", "bank_card")
    val card = fields.find(_.name == "card_number").get
    assert(card.confidence_level == "low")
    assert(warnings.exists(_.contains("Luhn check failed")))
  }

  test("valid MM/YY expiry boosts to high") {
    val (fields, warnings) = FieldExtractor.extract(
      "VISA\n4111 1111 1111 1111\nEXP 12/26\n", "bank_card")
    val exp = fields.find(_.name == "expiry_date").get
    assert(exp.confidence_level == "high")
    assert(warnings.exists(_.contains("format valid")))
  }

  test("invalid expiry month lowers confidence") {
    val (fields, warnings) = FieldExtractor.extract("EXP 13/26\n", "bank_card")
    fields.find(_.name == "expiry_date").foreach { exp =>
      assert(exp.confidence_level == "low")
      assert(warnings.exists(_.contains("invalid month")))
    }
  }

  test("passport DD/MM/YYYY expiry boosts to high") {
    val (fields, warnings) = FieldExtractor.extract(
      "PASSPORT\nDate of Expiry: 25/09/2030\n", "passport")
    val exp = fields.find(_.name == "expiry_date").get
    assert(exp.confidence_level == "high")
    assert(warnings.exists(_.contains("format valid")))
  }

  test("MRZ full name normalization: '<' to spaces + upper") {
    assert(FieldExtractor.normalize("full_name", "SMITH<<JOHN") == "SMITH JOHN")
    assert(FieldExtractor.normalize("gender", "Male") == "M")
    assert(FieldExtractor.normalize("nationality", "gbr") == "GBR")
    assert(FieldExtractor.normalize("date_of_birth", "15/03/1985") == "15-03-1985")
  }

  test("property: maskPan preserves last 4 and hides the rest") {
    val panGen = Gen.chooseNum(13, 19).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(panGen) { pan =>
        val masked = FieldExtractor.maskPan(pan)
        val compact = masked.replace(" ", "")
        compact.takeRight(4) == pan.takeRight(4) &&
          compact.dropRight(4).forall(_ == '*')
      })
    assert(res.passed, res.status.toString)
  }
}
