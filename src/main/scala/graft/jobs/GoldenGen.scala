package graft.jobs

import java.nio.charset.StandardCharsets.UTF_8
import graft.pipeline.{Extractor, PagesSynth}

/** Regenerates the frozen golden fixture (FIXTURES.md §2). Run ONLY on an
  * intentional extractor_version bump:
  *   sbt "runMain graft.jobs.GoldenGen"
  * Writes src/test/resources/golden_extracted.tsv with one row per url:
  * url, sha256(text), document_type, type_confidence, confidence, status.
  * The byte-identity contract: GoldenSpec recomputes extraction and the
  * text hash must match EXACTLY.
  */
object GoldenGen {

  val Rows = 400L

  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  def line(i: Long): String = {
    val r = Extractor.extract(PagesSynth.row(i))
    List(r.url, sha256(r.text), r.document_type,
      r.type_confidence.toString, r.confidence.toString, r.status)
      .mkString("\t")
  }

  def main(args: Array[String]): Unit = {
    val out = new StringBuilder
    out ++= s"# golden fixture, extractor ${graft.model.Model.ExtractorVersion}\n"
    (0L until Rows).foreach { i => out ++= line(i); out += '\n' }
    val path = java.nio.file.Paths.get("src/test/resources/golden_extracted.tsv")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, out.toString)
    println(s"wrote $path (${Rows} rows)")
  }
}
