package graft.html

/** Text-density + link-density main-content classification
  * (Boilerpipe/jusText-style; north_star) — the analog of the reference's
  * region filtering + reconstruction overlay removal (K4/K6, SURVEY §2.2).
  *
  * Three strategies form the escalation ladder (O4 — the analog of
  * `OpenSourceOCRRouter.process_document`, /root/reference/ocr_service/
  * modules/open_source_ocr_stack.py:356-412):
  *   layer1 `mainContent`    — strict density classifier
  *   layer2 `allContent`     — every non-boilerplate block
  *   layer3 `fullText`       — everything, including chrome
  */
object ContentClassifier {

  /** Link-density above this marks a block as boilerplate (link farms,
    * nav lists). */
  val MaxLinkDensity = 0.33
  /** Word count at/above which a low-link block is content on its own. */
  val GoodWords = 20
  /** Medium blocks accepted when nearly link-free. */
  val MediumWords = 10
  val MediumMaxLinkDensity = 0.15
  /** Link-density cap for absorbed short neighbors / headings. */
  val NeighborMaxLinkDensity = 0.25

  private val Bad = 0
  private val Short = 1
  private val Good = 2

  /** Per-block labels for the strict classifier. */
  def labels(blocks: Vector[Block]): Array[Int] = {
    val n = blocks.size
    val lab = new Array[Int](n)
    var i = 0
    while (i < n) {
      val b = blocks(i)
      lab(i) =
        if (b.inBoiler || b.linkDensity > MaxLinkDensity) Bad
        else if (b.words >= GoodWords) Good
        else if (b.words >= MediumWords && b.linkDensity <= MediumMaxLinkDensity) Good
        else Short
      i += 1
    }
    // absorption pass: short blocks adjacent to good ones join the content
    // (jusText-style neighbor smoothing); headings preceding good blocks too.
    val out = lab.clone()
    i = 0
    while (i < n) {
      if (lab(i) == Short) {
        val b = blocks(i)
        val prevGood = i > 0 && lab(i - 1) == Good
        val nextGood = i + 1 < n && lab(i + 1) == Good
        if ((prevGood || nextGood) && b.linkDensity <= NeighborMaxLinkDensity)
          out(i) = Good
        else if (b.heading && nextGood) out(i) = Good
      }
      i += 1
    }
    out
  }

  /** layer1 — blocks labeled Good by the density classifier, in order. */
  def mainContent(blocks: Vector[Block]): Vector[Block] = {
    val lab = labels(blocks)
    val out = Vector.newBuilder[Block]
    var i = 0
    while (i < blocks.size) {
      if (lab(i) == Good) out += blocks(i)
      i += 1
    }
    out.result()
  }

  /** layer2 — all non-boilerplate, non-link-farm blocks. */
  def allContent(blocks: Vector[Block]): Vector[Block] =
    blocks.filter(b => !b.inBoiler && b.linkDensity <= MaxLinkDensity)

  /** layer3 — everything. */
  def fullText(blocks: Vector[Block]): Vector[Block] = blocks

  /** Accepted blocks joined in document order with "\n\n" — the same
    * assembly contract as region extraction (K12,
    * /root/reference/ocr_service/modules/ocr_engine.py:1438-1467). */
  def assemble(blocks: Vector[Block]): String =
    blocks.iterator.map(_.text).filter(_.nonEmpty).mkString("\n\n")
}
