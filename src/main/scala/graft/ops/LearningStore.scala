package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Learning-pattern side store (SURVEY §2.1 S8 — the analog of
  * `LearningEngine.learn_from_result` / `get_pattern_knowledge`,
  * /root/reference/ocr_service/modules/learning_engine.py:67-151):
  * append-only pattern log with 500-row retention per doc type and
  * best-by-score lookup.
  */
object LearningStore {

  val RetentionPerType = 500 // learning_engine.py:135-136

  /** Best pattern per doc_type by accuracy score (max_by; deterministic
    * tie-break on newest created_at then lowest id). */
  def bestPatterns(patterns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_type"))
      .orderBy(col("accuracy_score").desc, col("created_at").desc,
        col("pattern_id").asc)
    patterns
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Retention: keep the newest `RetentionPerType` rows per doc_type
    * (newest by `created_at` — see [[fromExtraction]] for what that
    * means when the caller supplies no ingestion-order column). */
  def applyRetention(patterns: DataFrame,
      keep: Int = RetentionPerType): DataFrame = {
    val w = Window.partitionBy(col("doc_type"))
      .orderBy(col("created_at").desc, col("pattern_id").asc)
    patterns
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .drop("rn")
  }

  /** Derive pattern rows from extraction output: one row per result —
    * the streaming-in shape of learn_from_result.
    *
    * `pattern_id` is a content-hash surrogate key: deterministic across
    * partition layouts (monotonically_increasing_id would reorder
    * retention/tie-breaks whenever parallelism changes); duplicate urls
    * collide to one id, making re-learning a url idempotent.
    *
    * `created_at` drives [[applyRetention]]'s newest-N window and
    * [[bestPatterns]]' recency tie-break, so it must be a real
    * ingestion-order column to reproduce the reference's newest-500
    * semantics — pass the batch/sequence column via `createdAtCol`
    * (e.g. a crawl timestamp or an ingest batch id). When the caller has
    * none (`createdAtCol = None`), created_at falls back to the url hash:
    * retention then keeps a DETERMINISTIC HASH-ORDERED subset per type,
    * not the most recent patterns — stable across reruns, but not
    * recency. */
  def fromExtraction(results: DataFrame,
      createdAtCol: Option[String] = None): DataFrame =
    results.select(
      xxhash64(col("url")).as("pattern_id"),
      col("document_type").as("doc_type"),
      col("quality.quality_score").as("accuracy_score"),
      col("type_confidence"),
      lit(graft.model.Model.ExtractorVersion).as("version"),
      createdAtCol.map(c => col(c).cast("long"))
        .getOrElse(xxhash64(col("url"))).as("created_at"))

  /** The pipeline entry point: `ExtractResult` rows carry the page's
    * crawl timestamp (`warc_ts`), so retention is the reference's
    * newest-500-per-type (learning_engine.py:135-136) — ordered by real
    * ingestion time regardless of partition/shuffle order, with the url
    * hash as a deterministic tie-break inside one timestamp. */
  def fromPipeline(results: DataFrame): DataFrame =
    fromExtraction(results, createdAtCol = Some("warc_ts"))
}
