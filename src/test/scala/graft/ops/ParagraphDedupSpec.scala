package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** ParagraphDedup: corpus-wide first-occurrence paragraph dedup. */
class ParagraphDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-paradedup-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("duplicate paragraph survives only at its first occurrence") {
    val docs = Seq(
      (1L, "alpha text here\n\nshared boilerplate\n\nunique one"),
      (2L, "shared boilerplate\n\nsecond doc body"),
      (3L, "third body\n\nshared boilerplate")
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 2L)) // paras_total
    assert(out.map(_.getLong(3)).toSeq == Seq(3L, 1L, 1L)) // paras_kept
    assert(out(0).getString(1) ==
      "alpha text here\n\nshared boilerplate\n\nunique one")
    assert(out(1).getString(1) == "second doc body")
    assert(out(2).getString(1) == "third body")
  }

  test("winner is ordered by (doc_id, para_idx), not partition order") {
    // the same paragraph twice WITHIN one doc: idx 0 wins, idx 2 drops
    val docs = Seq(
      (5L, "rep\n\nmiddle\n\nrep"),
      (4L, "other\n\nrep")
    ).toDF("doc_id", "text").repartition(4)
    val marked = ParagraphDedup.markDuplicates(
      ParagraphDedup.paragraphs(docs, "doc_id", "text"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(3)))
      .toMap
    assert(marked((4L, 1)) === true)  // doc 4 idx 1 is the first "rep"
    assert(marked((5L, 0)) === false)
    assert(marked((5L, 2)) === false)
    assert(marked((5L, 1)) === true)  // "middle" unique
  }

  test("fully-duplicated document rebuilds to empty text") {
    val docs = Seq(
      (1L, "only para"),
      (2L, "only para")
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(1).getString(1) == "")
    assert(out(1).getLong(3) == 0L)
  }

  test("whitespace-only documents survive dedup as ('', 0, 0) rows") {
    // a doc with zero non-empty paragraphs emits no paragraph rows;
    // it must rejoin as a filterable empty, not silently vanish
    val docs = Seq(
      (1L, "real para"),
      (2L, "   \n\n  \n\n"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 0L &&
      out(1).getLong(3) == 0L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0L &&
      out(2).getLong(3) == 0L)
    assert(out(0).getString(1) == "real para" && out(0).getLong(3) == 1L)
  }

  test("chunkStats covers every input id and matches markDuplicates") {
    // the r08 counts-only chunkStats must agree with the generic
    // markDuplicates path it replaced, on a corpus with cross-doc and
    // within-doc chunk duplication plus an empty doc
    val docs = Seq(
      (1L, "a b c d a b c d"),
      (2L, "a b c d x y z w"),
      (3L, ""),
      (4L, "a b c d")
    ).toDF("doc_id", "text")
    val got = ParagraphDedup.chunkStats(docs, "doc_id", "text", 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = ParagraphDedup.markDuplicates(
        ParagraphDedup.wordChunks(docs, "doc_id", "text", 4))
      .groupBy(org.apache.spark.sql.functions.col("id"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("t"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("keep"), 1L)
            .otherwise(0L)).as("k"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("blank fragments are dropped before indexing") {
    val docs = Seq((1L, "\n\n\n\na\n\n\n\n\n\nb\n\n")).toDF("doc_id", "text")
    val ps = ParagraphDedup.paragraphs(docs, "doc_id", "text")
      .orderBy("para_idx").collect()
    assert(ps.map(_.getString(2)).toSeq == Seq("a", "b"))
    assert(ps.map(_.getInt(1)).toSeq == Seq(0, 1))
  }

  test("wordChunks slices exactly like SQL list slicing") {
    val docs = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val ch = ParagraphDedup.wordChunks(docs, "doc_id", "text", 2)
      .orderBy("para_idx").collect()
    assert(ch.map(_.getString(2)).toSeq == Seq("a b", "c d", "e"))
  }

  test("chunkStats: sf-style near-dup docs lose chunks to the earlier doc") {
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (11L, "w1 w2 w3 w4 x5 x6 x7 x8") // first 4-word chunk identical
    ).toDF("doc_id", "text")
    val st = ParagraphDedup.chunkStats(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(st(0).getLong(1) == 2L && st(0).getLong(2) == 2L)
    assert(st(1).getLong(1) == 2L && st(1).getLong(2) == 1L)
  }
}
