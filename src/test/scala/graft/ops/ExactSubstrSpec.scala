package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ExactSubstr: gram occurrences, winner election, span coverage,
  * rebuild, and the hashed == string-keyed variant equality. */
class ExactSubstrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-exactsubstr-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(docs: org.apache.spark.sql.DataFrame, n: Int,
      hashed: Boolean = true) =
    ExactSubstr.removeDuplicatedSpans(docs, "id", "text", n, hashed)
      .select("id", "n_tokens", "n_removed", "kept_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq

  test("shared span is kept in the first doc, cut from the second") {
    val docs = Seq(
      (0L, "alpha the quick brown fox jumps omega"),
      (1L, "start the quick brown fox jumps end tail"))
      .toDF("id", "text")
    val got = run(docs, n = 5)
    assert(got(0) == ((0L, 7L, 0L,
      "alpha the quick brown fox jumps omega")))
    // doc 1 loses exactly the 5 shared tokens
    assert(got(1) == ((1L, 8L, 5L, "start end tail")))
  }

  test("overlapping duplicated grams merge into one contiguous cut") {
    // 6 shared tokens with n=5 -> two overlapping grams in each doc;
    // coverage must merge to one 6-token cut, not 10
    val docs = Seq(
      (0L, "a1 w1 w2 w3 w4 w5 w6 z1"),
      (1L, "b1 w1 w2 w3 w4 w5 w6 z2"))
      .toDF("id", "text")
    val got = run(docs, n = 5)
    assert(got(0)._3 == 0L)
    assert(got(1) == ((1L, 8L, 6L, "b1 z2")))
  }

  test("documents shorter than n pass through untouched") {
    val docs = Seq((0L, "x y"), (1L, "x y"), (2L, "")).toDF("id", "text")
    val got = run(docs, n = 3)
    assert(got == Seq((0L, 2L, 0L, "x y"), (1L, 2L, 0L, "x y"),
      (2L, 0L, 0L, "")))
  }

  test("a fully duplicated doc is cut to empty, winner keeps all") {
    val docs = Seq(
      (0L, "p q r s t"),
      (1L, "p q r s t"),
      (2L, "p q r s t"))
      .toDF("id", "text")
    val got = run(docs, n = 5)
    assert(got(0) == ((0L, 5L, 0L, "p q r s t")))
    assert(got(1) == ((1L, 5L, 5L, "")))
    assert(got(2) == ((2L, 5L, 5L, "")))
  }

  test("intra-document repetition is cut after its own first occurrence") {
    val docs = Seq((0L, "m n o m n o tail1 tail2")).toDF("id", "text")
    val got = run(docs, n = 3)
    // gram "m n o" occurs at pos 0 (winner) and pos 3
    assert(got(0) == ((0L, 8L, 3L, "m n o tail1 tail2")))
  }

  test("hashed and string-keyed variants agree") {
    val docs = (0L until 60L).map { i =>
      val base = s"w${i % 7} common span of text here w${i % 5} x$i"
      (i, base)
    }.toDF("id", "text")
    val h = run(docs, n = 4, hashed = true)
    val s = run(docs, n = 4, hashed = false)
    assert(h == s)
  }

  test("property: matches a naive in-memory reference on random corpora") {
    // brute-force reference: enumerate every occurrence, group by gram,
    // elect min-(doc,pos) winners, cover non-winner spans, rebuild
    def naive(docs: Seq[(Long, String)], n: Int): Map[Long, String] = {
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ", -1).filter(_.nonEmpty).toSeq
      }.toMap
      val occ = for {
        (id, ts) <- toks.toSeq
        i <- 0 to ts.length - n
        if ts.length >= n
      } yield (ts.slice(i, i + n).mkString(" "), id, i)
      val covered = occ.groupBy(_._1).filter(_._2.size > 1).values.flatMap {
        os =>
          val win = os.minBy(o => (o._2, o._3))
          os.filterNot(_ == win)
            .flatMap(o => (o._3 until o._3 + n).map(p => (o._2, p)))
      }.toSet
      toks.map { case (id, ts) =>
        id -> ts.zipWithIndex
          .filterNot { case (_, i) => covered((id, i)) }
          .map(_._1).mkString(" ")
      }
    }
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      // small alphabet forces heavy duplication and overlapping spans
      val docs = (0L until 40L).map { i =>
        val len = 5 + rnd.nextInt(25)
        i -> (0 until len).map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
      }
      val n = 3 + trial // n in {3, 4, 5}
      val expected = naive(docs, n)
      val got = run(docs.toDF("id", "text"), n)
        .map(r => r._1 -> r._4).toMap
      assert(got == expected, s"trial=$trial n=$n")
    }
  }

  test("fnv64 is stable and spreads") {
    assert(ExactSubstr.fnv64("a b c") == ExactSubstr.fnv64("a b c"))
    val hs = (0 until 1000).map(i => ExactSubstr.fnv64(s"tok$i x y"))
    assert(hs.distinct.size == 1000)
  }
}
