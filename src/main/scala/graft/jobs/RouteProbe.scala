package graft.jobs
import graft.pipeline.{Extractor, PagesSynth}
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8000
    val rows = (0L until n.toLong).map(PagesSynth.row).toArray
    val (pdfs, htmls) = rows.partition(r => graft.pdf.PdfParser.isPdf(r.html))
    println(s"[route] pdfs=${pdfs.length} htmls=${htmls.length}")
    rows.foreach(Extractor.extract); rows.foreach(Extractor.extract) // warm
    def timed(label: String, rs: Array[graft.model.PageRow]): Unit = {
      val t0 = System.nanoTime()
      var s = 0L
      rs.foreach(r => s += Extractor.extract(r).text.length)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[route] $label%-6s ${sec * 1e6 / rs.length}%8.1f us/doc (sink=$s)")
    }
    timed("pdf", pdfs); timed("html", htmls)
    // PDF sub-stages
    val t1 = System.nanoTime()
    var s1 = 0L
    pdfs.foreach(r => s1 += graft.pdf.PdfParser.extractText(r.html).length)
    println(f"[route] pdf-parse-only ${(System.nanoTime()-t1)/1e3/pdfs.length}%8.1f us/doc (sink=$s1)")
  }
}
