package graft.jobs

import graft.pipeline.{Extractor, PagesSynth}

/** Order-independent fingerprint of the full extraction output over n
  * synth docs (md5 over url\0text\0status per doc, xor+sum folded) —
  * byte-identity check before/after kernel changes. Tooling main. */
object CorpusFingerprint {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    var xor = 0L
    var sum = 0L
    var i = 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    while (i < n) {
      val res = Extractor.extract(PagesSynth.row(i))
      md.reset()
      md.update(res.url.getBytes("UTF-8")); md.update(0.toByte)
      md.update(res.text.getBytes("UTF-8")); md.update(0.toByte)
      md.update(res.status.getBytes("UTF-8")); md.update(0.toByte)
      // fields + warnings too: kernel changes must not move ANY output
      res.fields.foreach { f =>
        md.update(s"${f.name}=${f.value}|${f.raw_ocr}|${f.confidence_level}"
          .getBytes("UTF-8"))
        md.update(0.toByte)
      }
      res.warnings.foreach(w => md.update(w.getBytes("UTF-8")))
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      xor ^= h
      sum += h
      i += 1
    }
    println(s"[corpusfp] n=$n xor=$xor sum=$sum")
  }
}
