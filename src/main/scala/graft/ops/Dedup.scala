package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sql.GraftFunctions._

/** Large-scale deduplication operators over a `documents`-shaped table
  * (`doc_id`, `text`, ...). All shapes are shuffle-minimal:
  *
  *  - exact:   one groupBy on the content hash (map-side combinable).
  *  - minhash: signature computed per-row (narrow), ONE explode to band
  *    buckets, ONE groupBy bucket; pairs verified by exact Jaccard only
  *    inside buckets (candidate set ≪ n²).
  *  - simhash: per-row 64-bit sketch (narrow), band-bucketed like minhash,
  *    hamming-verified.
  *
  * At 100 TB the bucket groupBys shuffle only (hash, id) pairs — bytes
  * per row are tiny and AQE coalesces the post-shuffle partitions.
  */
object Dedup {

  /** Exact dedup: canonical (minimum) doc_id per distinct text hash.
    * Output: one row per distinct text. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("copies"))

  /** Exact-dedup survivors: input rows minus later duplicates. (An r08
    * experiment replaced the window with a min-id aggregate + semi-join
    * — lighter shuffle bytes in principle, but the extra stage pair
    * made every caller SLOWER at bench scale because survivors are
    * recomputed per consumer; the window stays.) */
  def exactSurvivors(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // ---------------------------------------------------------------
  // MinHash + LSH (shingle → minhash → band → bucket-join)

  val NumPerm = 64
  val Bands = 16 // 16 bands × 4 rows
  val RowsPerBand: Int = NumPerm / Bands

  /** Per-band bucket population cap. A 100 TB crawl carries millions of
    * near-identical boilerplate pages that land in the SAME band bucket;
    * without a cap that one bucket yields O(m²) pairs and an OOM-sized
    * row. Capped buckets keep the `bucketCap` lowest doc_ids (documented
    * recall loss in pathological buckets — byte-identical mass dups are
    * handled by the exact pre-pass below, so real-world hot buckets are
    * already collapsed before this runs). */
  val DefaultBucketCap = 2000

  /** 64-perm MinHash signature per doc (narrow map; one text pass). */
  def minhashSignatures(docs: DataFrame, shingleSize: Int = 3): DataFrame = {
    val sigUdf = udf((text: String) =>
      MinHashKernel.signature(text, shingleSize, NumPerm))
    docs.select(col("doc_id"), sigUdf(col("text")).as("sig"))
  }

  /** LSH candidate pairs: docs sharing any band bucket (a < b).
    * Shape: explode to (band, band_hash, doc_id) rows → per-bucket size
    * cap via window row_number → bucket self-join with `a < b`. No
    * collected id arrays, no m² UDF — the join output is bounded by
    * cap²/2 per bucket and every row is (long, long). */
  def minhashCandidates(docs: DataFrame, shingleSize: Int = 3,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val sigs = minhashSignatures(docs, shingleSize)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(bandHashes(col("sig"))).as(Seq("band", "band_hash")))
    val w = Window.partitionBy(col("band"), col("band_hash"))
      .orderBy(col("doc_id"))
    val capped = banded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= bucketCap)
      .drop("rn")
    val left = capped.select(col("band"), col("band_hash"),
      col("doc_id").as("a"))
    val right = capped.select(col("band"), col("band_hash"),
      col("doc_id").as("b"))
    left.join(right, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Bucket-cap drop accounting: rows dropped per (band, band_hash) by
    * the cap — `log()` this next to the candidate count so a silent
    * recall loss never reads as full coverage. */
  def minhashBucketDrops(docs: DataFrame, shingleSize: Int = 3,
      bucketCap: Int = DefaultBucketCap): Long = {
    val sigs = minhashSignatures(docs, shingleSize)
    sigs.select(
      col("doc_id"),
      posexplode(bandHashes(col("sig"))).as(Seq("band", "band_hash")))
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(greatest(col("n") - bucketCap, lit(0L))), lit(0L)))
      .collect()(0).getLong(0)
  }

  /** Near-dup pairs with estimated Jaccard ≥ threshold (from signature
    * agreement), then exact n-gram Jaccard verification.
    *
    * Exact-duplicate pre-pass (`exactPrepass`, default on): byte-identical
    * texts collapse to their keeper (min doc_id) BEFORE signatures — the
    * scale-critical defusal of mass-identical boilerplate (those dups are
    * the exact-dedup operator's output, not near-dup pairs). Pairs are
    * then reported between surviving representatives only. */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.8,
      shingleSize: Int = 3, exactPrepass: Boolean = true,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val base = if (exactPrepass) exactSurvivors(docs) else docs
    val cand = minhashCandidates(base, shingleSize, bucketCap)
    val texts = base.select(col("doc_id"), col("text"))
    val jacUdf = udf((t1: String, t2: String) =>
      MinHashKernel.exactJaccard(t1, t2, shingleSize))
    cand
      .join(texts.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("text", "text_a"), Seq("a"))
      .join(texts.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("text", "text_b"), Seq("b"))
      .withColumn("jaccard", jacUdf(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  private def bandHashes(sig: Column): Column = {
    // sig: array<long>[64] → array<long>[16] of per-band xxhash-combined rows
    val bandExprs = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => sig.getItem(b * RowsPerBand + r))
      hash((lit(b) +: rows): _*).cast("long")
    }
    array(bandExprs: _*)
  }

  // ---------------------------------------------------------------
  // SimHash near-dup (hamming ≤ maxDistance)

  /** SimHash pairs within `maxDistance` hamming bits, candidate-filtered by
    * 4×16-bit band equality. Recall bound: a pair ≤3 bits apart ALWAYS
    * shares one of the 4 bands (pigeonhole) — exact for maxDistance ≤ 3;
    * beyond that, candidates require a lucky identical band (standard
    * simhash-dedup operating point is distance ≤ 3).
    *
    * Same hot-bucket defusal as minhash: exact-dedup pre-pass collapses
    * byte-identical floods (identical text ⇒ identical sketch ⇒ shared
    * EVERY band) and a per-bucket cap bounds residual mass-identical
    * sketches. Hamming stays in codegen (`bit_count(a XOR b)`). */
  def simhashNearDups(docs: DataFrame, maxDistance: Int = 3,
      exactPrepass: Boolean = true,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val base = if (exactPrepass) exactSurvivors(docs) else docs
    val sketched = base.select(col("doc_id"),
      graft_simhash(col("text")).as("sh"))
    val banded = sketched.select(
      col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "band_val")))
    val wCap = Window.partitionBy(col("band"), col("band_val"))
      .orderBy(col("doc_id"))
    val capped = banded
      .withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= bucketCap)
      .drop("rn")
    val a = capped.select(col("band"), col("band_val"),
      col("doc_id").as("a"), col("sh").as("sh_a"))
    val b = capped.select(col("band"), col("band_val"),
      col("doc_id").as("b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}

/** Pure shingle/minhash kernels (deterministic, executor-side). */
object MinHashKernel {

  /** Word shingles of size n, hashed to 64-bit. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) {
      if (tokens.isEmpty) return Array.emptyLongArray
      return Array(mix(tokens.mkString(" ").hashCode.toLong))
    }
    val out = new Array[Long](tokens.length - n + 1)
    var i = 0
    while (i + n <= tokens.length) {
      var h = 1125899906842597L
      var j = i
      while (j < i + n) {
        var k = 0
        val t = tokens(j)
        while (k < t.length) { h = (h ^ t.charAt(k)) * 1099511628211L; k += 1 }
        h = (h ^ ' ') * 1099511628211L
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  private def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** k-perm MinHash: permutation p = mix(shingle ^ seed_p); one pass over
    * shingles with k running minima. */
  def signature(text: String, shingleSize: Int, k: Int): Array[Long] = {
    val shingles = shingleHashes(text, shingleSize)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val s = shingles(i)
      var p = 0
      while (p < k) {
        val v = mix(s ^ (0x9e3779b97f4a7c15L * (p + 1)))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Exact shingle-set Jaccard between two texts. */
  def exactJaccard(t1: String, t2: String, n: Int): Double = {
    val s1 = shingleHashes(t1, n).toSet
    val s2 = shingleHashes(t2, n).toSet
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val inter = s1.intersect(s2).size
    inter.toDouble / (s1.size + s2.size - inter)
  }
}
