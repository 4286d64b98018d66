package graft.text

import graft.model.{FieldRow, Readiness => ReadinessRow}

/** Decision-readiness scoring.
  *
  * Ports `compute_decision_readiness` / `quality_band` / `MANDATORY_FIELDS`
  * (/root/reference/ocr_service/modules/decision_readiness.py:21-138):
  * score = 0.50·presence_ratio + 0.30·avg_field_conf + 0.20·type_conf,
  * ready at ≥0.70.
  */
object Readiness {

  val MandatoryFields: Map[String, List[String]] = Map(
    "passport" -> List("full_name", "document_number", "date_of_birth", "expiry_date"),
    "national_id" -> List("full_name", "document_number", "date_of_birth"),
    "id_document" -> List("full_name", "document_number", "date_of_birth"),
    "id_card" -> List("full_name", "document_number", "date_of_birth"),
    "driver_license" -> List("full_name", "document_number", "date_of_birth"),
    "bank_card" -> List("card_number", "expiry_date"),
    "credit_card" -> List("card_number", "expiry_date"),
    "debit_card" -> List("card_number", "expiry_date"),
    "bank_statement" -> List("full_name", "account_number"),
    "utility_bill" -> List("full_name", "total_amount"),
    "payslip" -> List("full_name", "salary"),
    "invoice" -> List("total_amount"),
    "tax_id" -> List("full_name", "tax_number"),
    "employment_letter" -> List("full_name", "employer"),
    "residence_permit" -> List("full_name", "document_number", "expiry_date"))

  private val ConfidenceWeights =
    Map("high" -> 1.0, "medium" -> 0.7, "low" -> 0.3)

  private val ReadyThreshold = 0.70

  /** quality_band — excellent≥0.85 / good≥0.65 / fair≥0.40 / poor. */
  def qualityBand(confidence: Double): String =
    if (confidence >= 0.85) "excellent"
    else if (confidence >= 0.65) "good"
    else if (confidence >= 0.40) "fair"
    else "poor"

  def compute(
      documentType: String,
      fields: Seq[FieldRow],
      typeConfidence: Double): ReadinessRow = {
    MandatoryFields.get(documentType) match {
      case None =>
        ReadinessRow(
          score = 0.0, ready = false, missing_mandatory = Nil,
          recommendation =
            s"Unknown document type '$documentType'. Manual review required.")
      case Some(mandatory) =>
        // last-wins on duplicate names, like Python dict comprehension
        val extracted: Map[String, String] =
          fields.map(f => f.name -> f.confidence_level).toMap

        val present = mandatory.filter(extracted.contains)
        val missing = mandatory.filterNot(extracted.contains)
        val presenceRatio =
          if (mandatory.nonEmpty) present.size.toDouble / mandatory.size else 1.0

        val confidenceScores =
          present.map(f => ConfidenceWeights.getOrElse(extracted(f), 0.3))
        val avgFieldConfidence =
          if (confidenceScores.nonEmpty)
            confidenceScores.sum / confidenceScores.size
          else 0.0

        var score = presenceRatio * 0.50 + avgFieldConfidence * 0.30 +
          typeConfidence * 0.20
        score = pyRound(math.min(math.max(score, 0.0), 1.0), 4)
        val ready = score >= ReadyThreshold

        val recommendation =
          if (ready) "Document is ready for automated processing."
          else if (missing.nonEmpty)
            s"Missing mandatory fields: ${missing.mkString(", ")}. " +
              "Manual review recommended."
          else
            "Low confidence on extracted fields. Manual review recommended."

        ReadinessRow(score, ready, missing, recommendation)
    }
  }
}
