package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the N→4N scaling gap: per-core-count throughput of
  * (a) the full extraction pipeline, (b) synth-only, (c) parse-only,
  * with JVM GC time deltas — separates allocation/GC pressure from
  * shuffle/scheduler overhead. Tooling main, not part of the library
  * surface (like PlanAudit/DiffGen).
  *
  * Usage: sbt "runMain graft.jobs.ScalingProbe [pages] [cores...]"
  */
object ScalingProbe {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val pages = if (args.nonEmpty) args(0).toLong else 40000L
    val coreLevels =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 16)

    for (round <- 0 until 2; cores <- coreLevels) {
      val builder = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
      // experiment knobs: SPARK_PROBE_CONF="k1=v1;k2=v2"
      sys.env.get("SPARK_PROBE_CONF").foreach(_.split(';').foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
      val spark = builder.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val parts = cores * 4
      try {
        // warm
        graft.pipeline.ExtractPipeline.extract(
          graft.pipeline.ExtractPipeline.pages(spark, pages / 4, parts), parts)
          .toDF().agg(count(lit(1))).collect()

        def timed(label: String)(body: => Unit): Unit = {
          val g0 = gcMillis(); val t0 = System.nanoTime()
          body
          val sec = (System.nanoTime() - t0) / 1e9
          val gc = gcMillis() - g0
          println(f"[probe] round=$round cores=$cores $label%-12s " +
            f"${pages / sec}%9.1f docs/s  ${sec}%6.2fs  gc=${gc}ms " +
            f"(${gc / 10.0 / sec}%.1f%% of wall)")
        }

        timed("full") {
          graft.pipeline.ExtractPipeline.extract(
            graft.pipeline.ExtractPipeline.pages(spark, pages, parts), parts)
            .toDF().agg(count(lit(1))).collect()
        }
        timed("synth-only") {
          graft.pipeline.ExtractPipeline.pages(spark, pages, parts)
            .map(r => r.html.length)
            .agg(sum(col("value"))).collect()
        }
        timed("parse-only") {
          graft.pipeline.ExtractPipeline.pages(spark, pages, parts)
            .map { r =>
              val dom = graft.html.HtmlTokenizer.parse(r.html)
              dom.size
            }
            .agg(sum(col("value"))).collect()
        }
        timed("no-shuffle") {
          graft.pipeline.ExtractPipeline.pages(spark, pages, parts)
            .map(r => graft.pipeline.Extractor.extract(r))
            .toDF().agg(count(lit(1))).collect()
        }
      } finally spark.stop()
    }
  }
}
