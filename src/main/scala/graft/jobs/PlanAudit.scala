package graft.jobs
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_top_customers", "q13_supply_join",
        "q8_token_counts")
    for (q <- targets) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    // pushdown check: projection should prune columns at scan
    println("===== pruned_scan =====")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id", "n_chars")
    println(docs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
