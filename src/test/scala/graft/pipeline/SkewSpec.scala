package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-defusal evidence (north_rule: "partitioning / shuffle / skew
  * handled explicitly"): with a pathologically hot host, partitioning by
  * host concentrates rows while the salted per-url hash stays uniform. */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted url-hash buckets stay uniform under a 50%-hot host") {
    import spark.implicits._
    val n = 8000
    val buckets = 16
    // 50% of urls on one host (the skew scenario)
    val urls = (0 until n).map { i =>
      val host = if (i % 2 == 0) "hot.example" else s"host${i % 97}.example"
      s"https://$host/path/$i"
    }.toDF("url")

    val byHost = urls
      .withColumn("b", pmod(hash(regexp_extract(col("url"), "https://([^/]+)", 1)),
        lit(buckets)))
      .groupBy("b").count().agg(max("count")).as[Long].collect()(0)

    val salted = urls
      .withColumn("b", pmod(hash(col("url"), lit(ExtractPipeline.DefaultSalt)),
        lit(buckets)))
      .groupBy("b").count()
    val saltedCounts = salted.select("count").as[Long].collect()
    val saltedMax = saltedCounts.max
    val ideal = n.toDouble / buckets

    // host partitioning concentrates ≥50% of rows into one bucket;
    // the salted per-url key stays within 25% of ideal
    assert(byHost >= n / 2)
    assert(saltedCounts.length == buckets)
    assert(saltedMax <= ideal * 1.25,
      s"salted max $saltedMax vs ideal $ideal")
  }

  test("doc-type resolution override (C8) semantics") {
    import graft.text.DocTypeResolve._
    // low-confidence generic detection yields the requested type
    assert(resolve("passport", "generic_document", 0.40) == (("passport", 0.65)))
    assert(resolve("passport", "statement", 0.60) == (("passport", 0.65)))
    // confident detection wins
    assert(resolve("passport", "invoice", 0.90) == (("invoice", 0.90)))
    // no prior: detection kept as-is
    assert(resolve("generic", "generic_document", 0.40) ==
      (("generic_document", 0.40)))
  }

  test("graft SQL functions registered and callable from spark.sql") {
    graft.sql.GraftFunctions.register(spark)
    import spark.implicits._
    val out = spark.sql(
      "SELECT graft_sanitize('a\\tb   c') AS s, " +
        "graft_luhn_valid('4111111111111111') AS l, " +
        "graft_confidence('invoice date total name') AS c, " +
        "graft_simhash('hello world') AS h, " +
        "graft_fingerprint('abc') AS f")
      .as[(String, Boolean, Double, Long, Long)].collect()(0)
    assert(out._1 == "a b c")
    assert(out._2)
    assert(out._3 > 0.0)
    assert(out._5 == (('a' * 257L + 'b') * 257L + 'c'))
  }
}
