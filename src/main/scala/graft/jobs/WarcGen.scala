package graft.jobs

import java.io.FileOutputStream

import org.apache.spark.sql.SparkSession

import graft.pipeline.ExtractPipeline
import graft.sources.Warc

/** Materialize the deterministic synthetic pages corpus as Common-Crawl
  * style `.warc.gz` files (per-record gzip members, request/warcinfo
  * noise records included) — the input for ExtractJob
  * `--input warc:<dir>` (glob on .warc.gz) demos and WARC-path
  * measurements.
  *
  *   runMain graft.jobs.WarcGen <outDir> [nPages=2000] [files=4]
  */
object WarcGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-warc")
    val nPages = if (args.length > 1) args(1).toLong else 2000L
    val files = if (args.length > 2) args(2).toInt else 4

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-warc-gen")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    new java.io.File(outDir).mkdirs()
    val pages = ExtractPipeline.pages(spark, nPages, files).collect()
    val perFile = math.max(1, (pages.length + files - 1) / files)
    var total = 0L
    pages.grouped(perFile).zipWithIndex.foreach { case (group, gi) =>
      val f = new java.io.File(outDir, f"synth-$gi%05d.warc.gz")
      val out = new FileOutputStream(f)
      Warc.Writer.warcinfo(out, java.time.Instant.ofEpochSecond(0),
        gzipMember = true)
      group.foreach { p =>
        Warc.Writer.request(out, p.url, p.warc_ts.toInstant,
          gzipMember = true)
        Warc.Writer.response(out, p.url, p.warc_ts.toInstant, p.html,
          chunked = p.url.hashCode % 3 == 0,
          gzipBody = p.url.hashCode % 2 == 0, gzipMember = true)
        total += 1
      }
      out.close()
    }
    println(s"""{"dir":"$outDir","files":$files,"responses":$total}""")
    spark.stop()
  }
}
