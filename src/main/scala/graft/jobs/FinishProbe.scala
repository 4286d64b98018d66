package graft.jobs
import graft.pipeline.{Extractor, PagesSynth}
object FinishProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8000
    val rows = (0L until n.toLong).map(PagesSynth.row).toArray
    val res = rows.map(Extractor.extract)
    val texts = res.map(_.text)
    val types = res.map(_.document_type)
    rows.foreach(Extractor.extract) // warm
    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val s = body
      println(f"[finish] $label%-14s ${(System.nanoTime()-t0)/1e3/n}%8.1f us/doc (sink=$s)")
    }
    timed("toLowerCase") { var s=0L; texts.foreach(t => s += t.toLowerCase.length); s }
    timed("langhints") { var s=0L
      texts.foreach { t => val l = t.toLowerCase
        s += graft.text.LangHints.detectLower(t, l)._1.length }; s }
    timed("readiness") { var s=0L
      types.foreach(dt => s += graft.text.Readiness.compute(dt, Nil, 0.5).missing_mandatory.size); s }
    timed("quality") { var s=0L
      texts.zip(types).foreach { case (t, dt) => s += graft.text.Quality.evaluate(t, dt).reasons.size }; s }
    timed("utf8bytes") { var s=0L; texts.foreach(t => s += t.getBytes("UTF-8").length); s }
    timed("cardintel2") { var s=0L
      texts.foreach { t => val l = t.toLowerCase
        s += graft.text.CardIntel.analyzeLower(t, l, "standard_form")._3.candidate_count }; s }
  }
}
