package graft.jobs

/** One-off differential corpus: Scala-side outputs of sanitize /
  * confidence / quality over fuzzed inputs, for byte-compare against the
  * reference's Python implementations (driver-side script). */
object DiffGen {
  def main(args: Array[String]): Unit = {
    val r = new java.util.Random(123)
    val pieces = Array(
      "4111 1111 1111 1111", "4048-3700-0450", "total", "invoice",
      "café", "—", " ", "  ", "\t", "\n", "hello", "world",
      "12/26", "a.b,c:d;e", "1234-5678-9012-3456-7890", "£$€",
      "!|!|", "DNI: 1234?678X", "0450", "...", "", "驚", "é",
      "'quote'", "“dq”", "4048370004", "x" * 50,
      "name date fecha", " nbsp ", "4111.1111.1111.1111")
    val sb = new StringBuilder
    for (_ <- 0 until 400) {
      val n = 1 + r.nextInt(12)
      val s = (0 until n).map(_ => pieces(r.nextInt(pieces.length))).mkString(
        if (r.nextBoolean()) " " else "")
      val b64 = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
      val out = graft.text.Sanitizer.sanitize(s)
      val outB64 = java.util.Base64.getEncoder.encodeToString(out.getBytes("UTF-8"))
      val conf = graft.text.Confidence.calculate(s)
      val q = graft.text.Quality.evaluate(s, "other")
      sb.append(s"$b64\t$outB64\t$conf\t${q.quality_score}\t${q.classification}\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/diff_scala.tsv"), sb.toString)
    println("WROTE /tmp/diff_scala.tsv")
  }
}
