package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DomainCap: the salted two-phase cap must equal the naive single
  * window on every input, including one with a dominating hot host. */
class DomainCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-domaincap-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("hostOf parses, lowercases, and never throws") {
    assert(DomainCap.hostOf("https://EXAMPLE.com:8080/p?q=1") == "example.com")
    assert(DomainCap.hostOf("https://sub.host.example/x") == "sub.host.example")
    assert(DomainCap.hostOf("not a url ::") == "")
    assert(DomainCap.hostOf(null) == "")
    assert(DomainCap.hostOf("") == "")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("salted cap equals the naive window under a hot-host skew") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 2000L).map { i =>
      val host = if (rnd.nextInt(10) < 4) "hot.example"
        else s"h${rnd.nextInt(50)}.example"
      (i, host, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("doc_id", "host", "quality")
    for (k <- Seq(1, 3, 17); salts <- Seq(1, 4, 16)) {
      val got = DomainCap.cap(df, k,
        Seq(col("quality").desc, col("doc_id").asc), col("doc_id"), salts)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = naive(df, k).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == want, s"k=$k salts=$salts")
    }
  }

  test("hostStats reports per-host drop counts") {
    val df = Seq(
      (0L, "a.example"), (1L, "a.example"), (2L, "a.example"),
      (3L, "b.example")
    ).toDF("doc_id", "host")
    val got = DomainCap.hostStats(df, 2).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a.example", 3L, 1L), ("b.example", 1L, 0L)))
  }
}
