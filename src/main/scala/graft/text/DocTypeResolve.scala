package graft.text

/** Requested-vs-detected doc-type resolution (C8).
  *
  * Ports `_resolve_document_type` (/root/reference/ocr_service/routers/
  * ocr.py:81-93): keep the caller-requested type when detection is
  * generic-ish and below the confidence threshold. Used by API callers
  * that know the expected doc type; the batch pipeline passes
  * requested = "generic" (no prior), which always keeps the detection.
  */
object DocTypeResolve {

  val LowConfidenceThreshold = 0.65 // routers/ocr.py:195
  private val GenericDetections = Set("generic_document", "statement", "form")

  def resolve(
      requestedDocType: String,
      detectedDocumentType: String,
      typeConfidence: Double,
      lowConfidenceThreshold: Double = LowConfidenceThreshold)
      : (String, Double) = {
    if (requestedDocType != "generic" &&
        typeConfidence < lowConfidenceThreshold &&
        GenericDetections.contains(detectedDocumentType))
      (requestedDocType, lowConfidenceThreshold)
    else (detectedDocumentType, typeConfidence)
  }
}
