package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SeqPack: the bucketed two-level prefix sum must equal the naive
  * global window at every bucketSpan; boundary and occupancy math. */
class SeqPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-seqpack-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, seqLen: Long) = {
    val w = Window.orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("token_start",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("seq_start", expr(s"token_start DIV $seqLen"))
      .withColumn("seq_offset", pmod(col("token_start"), lit(seqLen)))
      .withColumn("seqs_spanned", when(col("n") <= 0L, 0L)
        .otherwise(expr(s"(token_start + n - 1) DIV $seqLen") -
          col("seq_start") + 1L))
  }

  test("bucketed prefix equals the naive global window, all spans") {
    val rnd = new scala.util.Random(7)
    // sparse non-contiguous ids, zero-token docs included
    val rows = (0 until 500).map(i =>
      (i.toLong * 3 + rnd.nextInt(2), rnd.nextInt(40).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("id", "n").repartition(8)
    val want = naive(df, 128)
      .select("id", "token_start", "seq_start", "seq_offset",
        "seqs_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    for (span <- Seq(1L, 3L, 16L, 1L << 20)) {
      val got = SeqPack.pack(df, "id", "n", seqLen = 128,
        bucketSpan = span)
        .select("id", "token_start", "seq_start", "seq_offset",
          "seqs_spanned")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(got == want, s"span=$span")
    }
  }

  test("boundary crossing: hand case") {
    val df = Seq((0L, 7L), (1L, 5L), (2L, 0L), (3L, 10L))
      .toDF("id", "n")
    val got = SeqPack.pack(df, "id", "n", seqLen = 10, bucketSpan = 2)
      .select("id", "token_start", "seq_start", "seq_offset",
        "seqs_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 0L, 1L),   // tokens 0-6, inside seq 0
      (1L, 7L, 0L, 7L, 2L),   // tokens 7-11, crosses into seq 1
      (2L, 12L, 1L, 2L, 0L),  // empty doc at the stream position
      (3L, 12L, 1L, 2L, 2L))) // tokens 12-21, seqs 1-2
  }

  test("sequenceStats: occupancy sums back to the token total") {
    val rnd = new scala.util.Random(13)
    val df = (0L until 200L).map(i => (i, rnd.nextInt(50).toLong))
      .toDF("id", "n")
    val packed = SeqPack.pack(df, "id", "n", seqLen = 64, bucketSpan = 16)
    val stats = SeqPack.sequenceStats(packed, "n", seqLen = 64)
    val total = df.agg(sum("n")).head().getLong(0)
    val filled = stats.agg(sum("tokens_filled")).head().getLong(0)
    assert(filled == total)
    // every fully-interior sequence is exactly full
    val maxSeq = stats.agg(max("seq_id")).head().getLong(0)
    val interior = stats.filter(col("seq_id") < maxSeq)
      .select("tokens_filled").collect().map(_.getLong(0))
    assert(interior.forall(_ == 64L))
  }

  test("sequenceStats: doc counts per sequence, hand case") {
    val df = Seq((0L, 7L), (1L, 5L), (3L, 10L)).toDF("id", "n")
    val packed = SeqPack.pack(df, "id", "n", seqLen = 10, bucketSpan = 64)
    val got = SeqPack.sequenceStats(packed, "n", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // seq 0: doc0 (7) + doc1 (3 of 5); seq 1: doc1 (2) + doc3 (8);
    // seq 2: doc3 (2)
    assert(got == Seq((0L, 2L, 10L), (1L, 2L, 10L), (2L, 1L, 2L)))
  }

  test("rejects non-positive parameters") {
    val df = Seq((0L, 1L)).toDF("id", "n")
    intercept[IllegalArgumentException] {
      SeqPack.pack(df, "id", "n", seqLen = 0)
    }
    intercept[IllegalArgumentException] {
      SeqPack.pack(df, "id", "n", seqLen = 8, bucketSpan = 0)
    }
  }
}

/** Materialized packing: actual sequence assembly from document
  * pieces. */
class SeqMaterializeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-seqmat-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("sequences assemble doc pieces in stream order across boundaries") {
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h"))
      .toDF("id", "text")
    val got = SeqPack.materialize(docs, "id", "text", seqLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    // stream: a b c d | e f g h
    assert(got == Seq((0L, 2L, 4L, "a b c d"), (1L, 2L, 4L, "e f g h")))
  }

  test("partial tail sequence; empty docs occupy no stream space") {
    val docs = Seq((0L, "x y z"), (1L, ""), (2L, "w")).toDF("id", "text")
    val got = SeqPack.materialize(docs, "id", "text", seqLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 1L, 3L, "x y z"), (1L, 1L, 1L, "w")))
  }

  test("concatenating sequences reproduces the document stream " +
      "(bucket boundaries included)") {
    val docs = (0L until 90L)
      .map(i => (i, (0L until (i % 7)).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("id", "text")
    val seqs = SeqPack.materialize(docs, "id", "text", seqLen = 10,
      bucketSpan = 16)
      .collect().map(r => r.getLong(0) -> r.getString(3))
      .sortBy(_._1).map(_._2)
    val stream = docs.orderBy("id").collect()
      .map(_.getString(1)).filter(_.nonEmpty).mkString(" ")
    assert(seqs.mkString(" ") == stream)
    // every non-tail sequence is exactly seqLen tokens
    seqs.dropRight(1).foreach(s =>
      assert(s.split(" ").length == 10, s"bad seq len: '$s'"))
  }
}
