package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch data-quality gate (SURVEY §2.5 O12 — the analog of the
  * reference's Great Expectations checks,
  * /root/reference/ocr_service/utils/validation.py:19-56, and drift
  * summary, utils/drift_detection.py:45-80): aggregate assertions over
  * an extraction-output batch as plain Catalyst aggregations —
  * one map-combined pass, no per-row overhead.
  */
object ValidationGate {

  final case class GateResult(
      total: Long,
      failed: Long,
      empty_text: Long,
      null_url: Long,
      dup_url: Long,
      confidence_out_of_range: Long,
      type_conf_out_of_range: Long,
      passed: Boolean)

  /** Null/range/uniqueness checks; `passed` when hard invariants hold
    * (no null urls, no dup urls, all scores in [0,1]). */
  def check(results: DataFrame): GateResult = {
    val agg = results.agg(
      count(lit(1)).as("total"),
      sum(when(col("status") === "FAILED", 1L).otherwise(0L)).as("failed"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("empty"),
      sum(when(col("url").isNull, 1L).otherwise(0L)).as("null_url"),
      (count(lit(1)) - countDistinct(col("url"))).as("dup_url"),
      sum(when(col("confidence") < 0.0 || col("confidence") > 1.0, 1L)
        .otherwise(0L)).as("conf_oor"),
      sum(when(col("type_confidence") < 0.0 || col("type_confidence") > 1.0, 1L)
        .otherwise(0L)).as("tconf_oor")
    ).collect()(0)

    val r = GateResult(
      total = agg.getLong(0),
      failed = agg.getLong(1),
      empty_text = agg.getLong(2),
      null_url = agg.getLong(3),
      dup_url = agg.getLong(4),
      confidence_out_of_range = agg.getLong(5),
      type_conf_out_of_range = agg.getLong(6),
      passed = false)
    r.copy(passed = r.null_url == 0 && r.dup_url == 0 &&
      r.confidence_out_of_range == 0 && r.type_conf_out_of_range == 0)
  }

  /** Distribution summary for drift comparison between two batches:
    * per-document_type share + mean quality (join on document_type to
    * diff against a reference batch). */
  def distribution(results: DataFrame): DataFrame =
    results
      .groupBy(col("document_type"))
      .agg(
        count(lit(1)).as("docs"),
        avg(col("quality.quality_score")).as("mean_quality"),
        avg(col("confidence")).as("mean_confidence"))
}
