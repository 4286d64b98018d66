package graft.jobs

import graft.pipeline.{Extractor, PagesSynth}

/** Per-pattern cost breakdown of the field extractor over the synth
  * corpus — which regexes actually burn the 300+ µs/doc. Tooling main. */
object FieldsProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 6000
    val rows = (0L until n.toLong).map(PagesSynth.row).toArray
    // texts + doc types as the real pipeline sees them
    val docs = rows.flatMap { r =>
      val res = Extractor.extract(r)
      if (res.status != "FAILED") Some((res.text, res.document_type)) else None
    }
    println(s"[fields] ${docs.length} docs; type histogram: " +
      docs.groupBy(_._2).view.mapValues(_.length).toMap.toSeq.sortBy(-_._2)
        .mkString(", "))
    // warm
    docs.foreach { case (t, dt) => graft.text.FieldExtractor.extract(t, dt) }
    val t0 = System.nanoTime()
    docs.foreach { case (t, dt) => graft.text.FieldExtractor.extract(t, dt) }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[fields] extract total: ${sec * 1e6 / docs.length}%.1f us/doc")

    // per-field-def timing: run each def's tryPatterns over every doc of
    // a matching type
    val defs = graft.text.FieldExtractor.FieldDefinitions
    val byType = docs.groupBy(_._2)
    for ((dt, ds) <- byType.toSeq.sortBy(-_._2.length)
         if defs.contains(dt) && ds.length > 50) {
      val texts = ds.map(_._1)
      for (d <- defs(dt)) {
        val s0 = System.nanoTime()
        var hits = 0
        texts.foreach { t =>
          if (graft.text.FieldExtractor.tryPatterns(t, d.patterns).isDefined)
            hits += 1
        }
        val us = (System.nanoTime() - s0) / 1e3 / texts.length
        println(f"[fields] $dt%-16s ${d.name}%-18s $us%7.1f us/doc  hits=$hits/${texts.length}")
      }
    }
  }
}
