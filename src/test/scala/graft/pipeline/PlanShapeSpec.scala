package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Physical-plan invariants (PLANS.md): the extraction pipeline has
  * exactly ONE shuffle (the salted url-hash repartition), and the oracle
  * joins broadcast their dimension side. */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false") // plan text stability
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extraction pipeline plans exactly one Exchange") {
    val ds = ExtractPipeline.extract(ExtractPipeline.pages(spark, 100, 4), 4)
    val plan = ds.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"))
  }

  test("broadcast join chosen for dimension tables") {
    val dir = "/root/testdata/sf0.001"
    val plan = graft.SparkEntry.queries("q13_supply_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("filter + projection push down to parquet scan") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en")
      .select("doc_id", "n_chars")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(lang,en)"),
      plan.take(2000))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      plan.take(2000))
  }
}
