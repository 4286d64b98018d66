package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import graft.model.{ExtractResult, PageRow}
import graft.pipeline.Extractor

/** Structured-Streaming shape of the pipeline (SURVEY §2.6 "streaming"):
  * the batch job is the north-rule deliverable; this is the incremental
  * analog of the reference's queue worker (S7, /root/reference/
  * ocr_service/worker.py:45-148) — at-least-once pull + idempotency key
  * realized as `withWatermark(warc_ts) + dropDuplicates(url)` and an
  * idempotent `foreachBatch`/append sink.
  */
object StreamingExtract {

  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** File-source stream over a directory of pages parquet. */
  def readPages(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(PageSchema).parquet(dir)

  /** Streaming extraction: late-dup suppression keyed by url within the
    * watermark (the streaming analog of the Redis idempotency key, O7),
    * then the same per-row kernel. */
  def extract(pages: DataFrame, watermark: String = "10 minutes")
      : Dataset[ExtractResult] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withWatermark("warc_ts", watermark)
      .dropDuplicates("url", "warc_ts")
      .as[PageRow]
      .mapPartitions(_.map(Extractor.extract))
  }

  /** Streaming extraction behind the stateful first-seen filter
    * ([[StatefulDedup.firstSeen]]): unbounded exactly-once per url —
    * suppresses BOTH redeliveries (same url+warc_ts) and re-crawls
    * (same url, newer warc_ts), where the watermarked [[extract]] only
    * covers in-window redeliveries. No watermark: first-seen state is
    * one boolean per url with no timeout (the flatMapGroupsWithState
    * path can't chain after another stateful operator, so it replaces
    * dropDuplicates rather than following it). */
  def extractFirstSeen(pages: DataFrame): Dataset[ExtractResult] = {
    val spark = pages.sparkSession
    import spark.implicits._
    StatefulDedup.firstSeen(pages.as[PageRow])
      .mapPartitions(_.map(Extractor.extract))
  }

  /** Available-now (process-backlog-and-stop) writer — the batch-resume
    * shape on a streaming source. */
  def writer(results: Dataset[ExtractResult], outDir: String,
      checkpointDir: String): DataStreamWriter[ExtractResult] =
    results.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())

  /** Ingest-rate metrics stream: docs + html bytes per 5-minute
    * event-time window per lang (watermarked windowed aggregation —
    * late rows beyond the watermark are dropped). */
  def metrics(pages: DataFrame, watermark: String = "10 minutes"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), "5 minutes"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(length(col("html"))).as("bytes"))
}
