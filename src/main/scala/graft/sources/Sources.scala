package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PageRow

/** Ingest paths (SURVEY §2.1 S1–S5).
  *
  * Primary ingest is the pages table scan (Parquet/Iceberg). `binaryFile`
  * covers the reference's path-based input (S5,
  * /root/reference/ocr_service/modules/open_source_ocr_stack.py:522-527);
  * payload normalization covers S1
  * (ocr_service/modules/image_toolkit.py:28-49).
  */
object Sources {

  /** Pages table scan with the canonical schema (column pruning +
    * predicate pushdown apply — pass only needed columns downstream). */
  def pagesTable(spark: SparkSession, path: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("url", "warc_ts", "html", "text", "lang")
      .as[PageRow]
  }

  /** Directory-of-files ingest via the built-in binaryFile source:
    * one row per file (path, modificationTime, length, content) →
    * PageRow(url = file path, html = content). */
  def binaryFiles(spark: SparkSession, glob: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(
        col("path").as("url"),
        col("modificationTime").cast("timestamp").as("warc_ts"),
        col("content").as("html"),
        lit("").as("text"),
        lit("").as("lang"))
      .as[PageRow]
  }

  /** S1 payload normalization: accept raw bytes, base64 strings or
    * data:-URIs in a string column → binary. Invalid base64 → null
    * (status row downstream, never a task failure). */
  def normalizePayload(df: DataFrame, stringCol: String): DataFrame = {
    val c = col(stringCol)
    val b64Body = when(c.startsWith("data:"),
      regexp_extract(c, "base64,(.*)$", 1)).otherwise(c)
    df.withColumn(stringCol + "_bytes", try_to_binary(b64Body, lit("base64")))
  }
}
