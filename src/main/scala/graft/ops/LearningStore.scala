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

  /** Retention: keep the newest `RetentionPerType` rows per doc_type. */
  def applyRetention(patterns: DataFrame,
      keep: Int = RetentionPerType): DataFrame = {
    val w = Window.partitionBy(col("doc_type"))
      .orderBy(col("created_at").desc, col("pattern_id").asc)
    patterns
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .drop("rn")
  }

  /** Derive pattern rows from extraction output: one row per
    * (document_type) with its observed quality — the streaming-in shape
    * of learn_from_result. */
  def fromExtraction(results: DataFrame): DataFrame =
    results.select(
      // content-hash surrogate key: deterministic across partition
      // layouts (monotonically_increasing_id would reorder retention/
      // tie-breaks whenever parallelism changes)
      xxhash64(col("url")).as("pattern_id"),
      col("document_type").as("doc_type"),
      col("quality.quality_score").as("accuracy_score"),
      col("type_confidence"),
      lit(graft.model.Model.ExtractorVersion).as("version"))
      // ingestion-sequence surrogate (no wall-clock in the kernel)
      .withColumn("created_at", col("pattern_id"))
}
