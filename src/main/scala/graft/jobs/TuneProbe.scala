package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-tuning A/B harness: measures N→4N efficiency of the
  * extraction job under config variants with the SAME protocol the
  * bench uses (per-level full+half timing, min-subtraction steady-state
  * rate), interleaving variants within each round so a machine-throttle
  * epoch cannot be attributed to one variant.
  *
  * Variants cover the round-4 hypotheses:
  *  - input source: inline synth (allocation-heavy generator timed with
  *    the job) vs pre-materialized parquet on tmpfs (the north-rule
  *    shape: read a table, extract)
  *  - shuffle partition multiplier (tasks per core)
  *  - spark.locality.wait=0
  *
  * Usage: sbt "runMain graft.jobs.TuneProbe [pages] [rounds]"
  */
object TuneProbe {

  private def session(cores: Int, extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"tune-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench")
      .config("spark.shuffle.compress", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "4m")
      .config("spark.reducer.maxSizeInFlight", "128m")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def runJob(spark: SparkSession, input: String, path: String,
      n: Long, parts: Int): Long = {
    import spark.implicits._
    def pages =
      if (input.startsWith("synth"))
        graft.pipeline.ExtractPipeline.pages(spark, n, parts)
      else spark.read.parquet(path).as[graft.model.PageRow]
    val results = input match {
      case "synth" | "parquet" => // current shape: shuffle html, then map
        graft.pipeline.ExtractPipeline.extract(pages, parts).toDF()
      case "noshuffle" => // narrow scan→extract (no exchange at all)
        pages.mapPartitions(_.map(graft.pipeline.Extractor.extract)).toDF()
      case "postshuffle" => // extract narrow, shuffle the (smaller) results
        pages.mapPartitions(_.map(graft.pipeline.Extractor.extract)).toDF()
          .repartition(parts, hash(col("url"),
            lit(graft.pipeline.ExtractPipeline.DefaultSalt)))
    }
    results.agg(count(lit(1)), sum(col("bytes_in")))
      .collect()(0).getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 120000L
    val rounds = if (args.length > 1) args(1).toInt else 3
    val nCores = 4
    val cores4N = 16

    // pre-materialize full + half page tables on tmpfs once
    val fullDir = "/dev/shm/graft-pages-full"
    val halfDir = "/dev/shm/graft-pages-half"
    locally {
      val s = session(32, Map.empty)
      try {
        graft.pipeline.ExtractPipeline.pages(s, nPages, 64)
          .write.mode("overwrite").parquet(fullDir)
        graft.pipeline.ExtractPipeline.pages(s, nPages / 2, 64)
          .write.mode("overwrite").parquet(halfDir)
        // global warm
        runJob(s, "synth", "", nPages / 2, 128)
        runJob(s, "parquet", fullDir, nPages, 128)
      } finally s.stop()
    }

    final case class Variant(label: String, input: String,
      partsMult: Int, extra: Map[String, String])
    val variants = Seq(
      Variant("parq-p4", "parquet", 4, Map.empty),
      Variant("noshuffle", "noshuffle", 4, Map.empty),
      Variant("postshuffle", "postshuffle", 4, Map.empty))

    def pair(cores: Int, v: Variant): (Double, Double) = {
      val s = session(cores, v.extra)
      try {
        val parts = cores * v.partsMult
        // per-level warm (same body as the timed runs)
        if (v.input == "synth") runJob(s, "synth", "", nPages / 4, parts)
        else runJob(s, v.input, halfDir, nPages / 2, parts)
        val t0 = System.nanoTime()
        runJob(s, v.input, fullDir, nPages, parts)
        val tF = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        runJob(s, v.input, halfDir, nPages / 2, parts)
        val tH = (System.nanoTime() - t1) / 1e9
        (tF, tH)
      } finally s.stop()
    }

    def steady(full: Double, half: Double): Double = {
      val dt = full - half
      if (dt > 0.05 * full) (nPages - nPages / 2) / dt else nPages / full
    }

    for (round <- 0 until rounds; v <- variants) {
      val (af, ah) = pair(cores4N, v)
      val (bf, bh) = pair(nCores, v)
      val rN = steady(bf, bh)
      val r4 = steady(af, ah)
      println(f"[tune] round=$round ${v.label}%-12s N=${rN}%8.1f 4N=${r4}%9.1f eff=${r4 / (4 * rN)}%.3f (tN=$bf%.1f/$bh%.1f t4N=$af%.1f/$ah%.1f)")
    }
  }
}
