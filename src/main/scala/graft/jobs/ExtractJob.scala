package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractPipeline, PagesSynth}
import graft.sources.Sources

/** spark-submit entry point for the production extraction run
  * (SURVEY §7.1 jobs/):
  *
  *   spark-submit --class graft.jobs.ExtractJob app.jar \
  *     --input <pages parquet | warc:<glob> | synth:N> --output <dir> \
  *     --lineage <dir> --run-id <id> [--buckets B]
  *
  * Resumable: rerunning with the same run-id skips committed buckets
  * (per-partition lineage anti-filter + idempotent dynamic overwrite).
  * On a cluster, buckets should be ≈ 2-4× total executor cores so the
  * salted url-hash repartition balances hot hosts (north_rule).
  */
object ExtractJob {

  private val KnownOpts =
    Set("input", "output", "lineage", "run-id", "buckets", "narrow",
      "warc-split-mb", "wet", "cdx", "jsonl")

  def main(args: Array[String]): Unit = {
    // strict parsing: a dangling or unknown flag must not silently fall
    // back to defaults (it would resume someone else's lineage dir)
    if (args.length % 2 != 0 || args.grouped(2).exists(p =>
        !p(0).startsWith("--") || !KnownOpts.contains(p(0).drop(2)))) {
      System.err.println(
        "usage: ExtractJob --input <parquet|warc:glob|synth:N> --output <dir> " +
          "--lineage <dir> --run-id <id> [--buckets B] [--narrow true] " +
          "[--warc-split-mb M] [--wet <dir>] [--cdx true] [--jsonl <dir>]")
      sys.exit(2)
    }
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

    val input = opts.getOrElse("input", "synth:100000")
    val output = opts.getOrElse("output", "/tmp/graft-out")
    val lineage = opts.getOrElse("lineage", "/tmp/graft-lineage")
    val runId = opts.getOrElse("run-id", "run-default")

    val builder = SparkSession.builder()
      .appName(s"graft-extract-$runId")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default to local[*] for bare runs
    val spark =
      (if (sys.props.contains("spark.master")) builder
       else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defaultBuckets =
      math.max(spark.sparkContext.defaultParallelism * 2, 8)
    val buckets = opts.get("buckets") match {
      case None => defaultBuckets
      case Some(v) =>
        scala.util.Try(v.toInt).filter(_ > 0).getOrElse {
          System.err.println(s"--buckets must be a positive int (got '$v')")
          sys.exit(2)
        }
    }

    val pages =
      if (input.startsWith("synth:")) {
        val n = input.stripPrefix("synth:").toLong
        ExtractPipeline.pages(spark, n, buckets)
      } else if (input.startsWith("warc:")) {
        // raw crawl ingest: parse WARC files (plain or .warc.gz) at the
        // cluster edge, one task per file — the Common-Crawl layout.
        // --warc-split-mb M slices files bigger than M MB into sub-file
        // work units (exact gzip-member attribution) for rogue giants.
        val glob = input.stripPrefix("warc:")
        opts.get("warc-split-mb") match {
          case None =>
            graft.sources.Warc.warcFiles(spark, glob)
          case Some(v) =>
            val mb = scala.util.Try(v.toLong).filter(_ > 0).getOrElse {
              System.err.println(
                s"--warc-split-mb must be a positive int (got '$v')")
              sys.exit(2)
            }
            val splits = graft.sources.Warc.planSplits(spark, glob, mb << 20)
            graft.sources.Warc.warcSplitFiles(spark, splits)
        }
      } else Sources.pagesTable(spark, input)

    // --narrow true: write only (url, text, status, bytes_in, bucket) —
    // half the output bytes for consumers that don't need the
    // fields/cards/analytics structs. Strict like the other options: a
    // non-boolean value exits through the usage path, not a stack trace.
    val narrow = opts.get("narrow") match {
      case None => false
      case Some("true") => true
      case Some("false") => false
      case Some(other) =>
        System.err.println(
          s"--narrow must be true or false (got '$other'); " +
            "usage: ExtractJob --input <parquet|warc:glob|synth:N> --output <dir> " +
            "--lineage <dir> --run-id <id> [--buckets B] [--narrow true] " +
          "[--warc-split-mb M] [--wet <dir>]")
        sys.exit(2)
    }
    // --wet <dir>: additionally publish the run's text as Common-Crawl
    // WET-style conversion records (the format downstream CC-WET
    // consumers already read). Needs warc_ts → wide output only.
    val wetDir = opts.get("wet")
    if (wetDir.isDefined && narrow) {
      System.err.println("--wet requires the wide output (drop --narrow: " +
        "WET records carry warc_ts, which narrow mode prunes)")
      sys.exit(2)
    }
    // --cdx true: also write one CDX sidecar per WET part file (the
    // Common-Crawl index layout — urlkey, ts14, exact byte extents for
    // wayback-style random access)
    val cdx = opts.get("cdx") match {
      case None => false
      case Some("true") => true
      case Some("false") => false
      case Some(other) =>
        System.err.println(s"--cdx must be true or false (got '$other')")
        sys.exit(2)
    }
    if (cdx && wetDir.isEmpty) {
      System.err.println("--cdx true requires --wet <dir> (the sidecars " +
        "index the WET output)")
      sys.exit(2)
    }
    // --jsonl <dir>: additionally publish the run's text as gzipped
    // JSONL (one JSON object per line — the LLM-corpus interchange
    // format). Works in both wide and narrow modes (url/text/status
    // survive narrow pruning).
    val jsonlDir = opts.get("jsonl")
    val summary =
      ExtractPipeline.run(spark, pages, output, lineage, runId, buckets,
        ExtractPipeline.DefaultSalt, narrowOutput = narrow)
    val wetFiles = wetDir.map { d =>
      graft.sources.Warc.writeWet(
        spark.read.parquet(output)
          .select(org.apache.spark.sql.functions.col("url"),
            org.apache.spark.sql.functions.col("warc_ts"),
            org.apache.spark.sql.functions.col("text")), d,
        cdx = cdx).length
    }
    val jsonlFiles = jsonlDir.map { d =>
      graft.sources.Jsonl.write(
        spark.read.parquet(output)
          .select(org.apache.spark.sql.functions.col("url"),
            org.apache.spark.sql.functions.col("text"),
            org.apache.spark.sql.functions.col("status")), d).length
    }
    // one summary line for the orchestrator
    println(
      s"""{"run_id":"${summary.runId}","buckets":${summary.bucketsTotal},""" +
        s""""skipped":${summary.bucketsSkipped},"processed":${summary.bucketsProcessed},""" +
        s""""docs_in":${summary.docsIn},"docs_out":${summary.docsOut}""" +
        wetFiles.map(n => s""","wet_files":$n""").getOrElse("") +
        jsonlFiles.map(n => s""","jsonl_files":$n""").getOrElse("") + "}")
    spark.stop()
  }
}
