package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mixing: deterministic copy counts, the LCG draws, mixture stats, and
  * the training-order shuffle. */
class MixingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mixing-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docsOf(n: Int) =
    (0L until n.toLong).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "domain")

  test("integer rates are exact: weight 2e6 duplicates, 1e6 keeps, 0 drops") {
    val docs = docsOf(40)
    val weights = Seq(("a", 2000000L), ("b", 1000000L))
      .toDF("domain", "weight_e6")
    val got = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 40L, "b" -> 20L))

    val zero = Seq(("a", 0L), ("b", 0L)).toDF("domain", "weight_e6")
    assert(Mixing.sampleMixture(docs, "domain", "doc_id", zero).count() == 0)
  }

  test("missing domain defaults to rate 0 (dropped)") {
    val docs = docsOf(10)
    val weights = Seq(("a", 1000000L)).toDF("domain", "weight_e6")
    val got = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
      .select("domain").distinct().as[String].collect().toSeq
    assert(got == Seq("a"))
  }

  test("fractional rates land near target and are deterministic") {
    val docs = (0L until 2000L).map(i => (i, "a")).toDF("doc_id", "domain")
    val weights = Seq(("a", 1500000L)).toDF("domain", "weight_e6")
    val n1 = Mixing.sampleMixture(docs, "domain", "doc_id", weights).count()
    val n2 = Mixing.sampleMixture(docs, "domain", "doc_id", weights).count()
    assert(n1 == n2, "same input must produce identical output")
    // expected 3000 +- a few percent (LCG uniformity, not RNG luck)
    assert(math.abs(n1 - 3000L) < 150L, s"got $n1, expected ~3000")
  }

  test("copy indexes are 0..n_copies-1 and n_copies matches the rate") {
    val docs = docsOf(30)
    val weights = Seq(("a", 2500000L), ("b", 300000L))
      .toDF("domain", "weight_e6")
    val rows = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
      .select("doc_id", "n_copies", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, copies) =>
      val n = copies.head._2
      assert(copies.map(_._3).sorted.toSeq == (0L until n).toSeq)
    }
    // domain a: every doc gets 2 or 3 copies
    rows.filter(_._1 % 2 == 0).foreach { case (id, n, _) =>
      assert(n == 2L || n == 3L, s"doc $id n_copies=$n")
    }
  }

  test("lcg draws replay the documented arithmetic (the oracle contract)") {
    def lcgRef(x: Long, salt: Long): Long = {
      val m = 2147483647L
      val saltR = ((salt % m) + m + 1L) % m
      (((x % m) + saltR) % m) * 48271L % m
    }
    val ids = Seq(0L, 1L, 7L, 999999L, 2147483646L, 5000000000L)
    val got = ids.toDF("id")
      .select(col("id"), Mixing.lcg(col("id"), 0L).as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(got(i) == lcgRef(i, 0L), s"id=$i"))
  }

  test("shuffleKey is deterministic, copy-sensitive, and in range") {
    val df = Seq((1L, 0L), (1L, 1L), (2L, 0L)).toDF("id", "copy")
    val got = df.select(
      Mixing.shuffleKey(col("id"), col("copy"), 0L).as("k"))
      .as[Long].collect().toSeq
    assert(got.distinct.size == 3, "copies of one doc must scatter")
    assert(got.forall(k => k >= 0 && k < Mixing.LcgMod))
  }

  test("shuffleKey is exact for very large ids (no ANSI overflow)") {
    val df = Seq((Long.MaxValue - 1, 0L)).toDF("id", "copy")
    val k = df.select(Mixing.shuffleKey(col("id"), col("copy"), 0L))
      .as[Long].head()
    assert(k >= 0 && k < Mixing.LcgMod)
  }

  test("mixtureStats reports achieved e6 rates, zero for dropped domains") {
    val docs = docsOf(40)
    val weights = Seq(("a", 2000000L), ("b", 0L))
      .toDF("domain", "weight_e6")
    val sampled = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
    val got = Mixing.mixtureStats(docs, sampled, "domain")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == ((20L, 40L, 2000000L)))
    assert(got("b") == ((20L, 0L, 0L)))
  }

  test("assignSplits: total, deterministic, near-target proportions") {
    val docs = (0L until 5000L).toDF("doc_id")
    val splits = Seq(("train", 800000L), ("val", 100000L),
      ("test", 100000L))
    val got = Mixing.assignSplits(docs, "doc_id", splits)
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 5000L, "every row must land in a split")
    assert(math.abs(got("train") - 4000L) < 200L, s"train=${got("train")}")
    assert(math.abs(got("val") - 500L) < 120L, s"val=${got("val")}")
    assert(math.abs(got("test") - 500L) < 120L, s"test=${got("test")}")
    val again = Mixing.assignSplits(docs, "doc_id", splits)
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("assignSplits: zero-fraction split gets nothing; bad sum rejected") {
    val docs = (0L until 100L).toDF("doc_id")
    val got = Mixing.assignSplits(docs, "doc_id",
      Seq(("a", 1000000L), ("b", 0L)))
      .select("split").distinct().as[String].collect().toSeq
    assert(got == Seq("a"))
    intercept[IllegalArgumentException] {
      Mixing.assignSplits(docs, "doc_id", Seq(("a", 900000L)))
    }
  }

  test("ratesForBudget: exact e6 rates from token budget and shares") {
    val tokens = Seq(("a", 1000L), ("b", 4000L), ("c", 0L))
      .toDF("domain", "tokens")
    val props = Seq(("a", 500000L), ("b", 500000L), ("zz", 900000L))
      .toDF("domain", "prop_e6")
    val got = Mixing.ratesForBudget(tokens, props, "domain", 2000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // a: 2000*0.5/1000 = rate 1.0; b: 2000*0.5/4000 = 0.25
    assert(got == Map("a" -> ((1000L, 1000000L)),
      "b" -> ((4000L, 250000L))))
  }

  test("ratesForBudget: domain without a prop gets rate 0; budget bound") {
    val tokens = Seq(("a", 100L)).toDF("domain", "tokens")
    val props = Seq(("b", 1000000L)).toDF("domain", "prop_e6")
    val got = Mixing.ratesForBudget(tokens, props, "domain", 500L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 0L))
    intercept[IllegalArgumentException] {
      Mixing.ratesForBudget(tokens, props, "domain", 10000000000000L)
    }
  }

  test("budgeted rates drive sampling to the requested token split") {
    // domain a: 300 docs x 10 tokens; domain b: 100 docs x 30 tokens —
    // equal token mass; ask for a 75/25 token split of a 3000 budget
    val docs = ((0L until 300L).map(i => (i, "a", 10L)) ++
      (300L until 400L).map(i => (i, "b", 30L)))
      .toDF("doc_id", "domain", "n_tokens")
    val tokens = docs.groupBy("domain")
      .agg(sum(col("n_tokens")).as("tokens"))
    val props = Seq(("a", 750000L), ("b", 250000L))
      .toDF("domain", "prop_e6")
    val rates = Mixing.ratesForBudget(tokens, props, "domain", 3000L)
      .select("domain", "weight_e6")
    val sampled = Mixing.sampleMixture(docs, "domain", "doc_id", rates)
    val gotTokens = sampled.groupBy("domain")
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets: a = 2250 tokens, b = 750 tokens (LCG draws, small jitter)
    assert(math.abs(gotTokens("a") - 2250L) <= 200L, s"a=${gotTokens("a")}")
    assert(math.abs(gotTokens("b") - 750L) <= 200L, s"b=${gotTokens("b")}")
  }

  test("orderForTraining: ordered read-back equals the shuffle_key sort") {
    val docs = (0L until 400L).map(i => (i, "a")).toDF("doc_id", "domain")
    val weights = Seq(("a", 1700000L)).toDF("domain", "weight_e6")
    val sampled = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
    val ordered = Mixing.orderForTraining(sampled, 4, "doc_id")
    // partitions are contiguous ranges: concatenating them in partition
    // order yields the globally sorted sequence
    val perPart = ordered.select(spark_partition_id().as("p"),
      col("shuffle_key"), col("doc_id"), col("copy"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val concat = perPart.sortBy(_._1).toSeq // stable: keeps within-part order
    val globallySorted = perPart.sortBy(t => (t._2, t._3, t._4)).toSeq
    assert(concat.map(t => (t._2, t._3, t._4)) ==
      globallySorted.map(t => (t._2, t._3, t._4)))
  }

  test("sampling is a zero-wide-shuffle plan (broadcast join only)") {
    val docs = docsOf(50)
    val weights = Seq(("a", 1000000L), ("b", 500000L))
      .toDF("domain", "weight_e6")
    val plan = Mixing.sampleMixture(docs, "domain", "doc_id", weights)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected wide shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"unexpected sort shuffle:\n$plan")
  }
}
