package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Incremental crawl dedup: which rows of a NEW crawl batch carry urls
  * absent from a (much larger) historical index. This is the recurring
  * 10^12-scale operation of a crawl-extraction pipeline — every fresh
  * crawl segment lands next to years of prior segments, and
  * re-extracting already-seen urls wastes the cluster. The reference
  * runs the same check per document against its idempotency cache
  * before doing any OCR work (reference
  * `ocr_service/modules/processor.py:136-151` — the cached result is
  * resolved before `_run_extraction`); this operator is that
  * membership check re-expressed as a distributed batch primitive.
  *
  * Semantics are EXACT: the output equals
  * `newBatch LEFT ANTI JOIN seen ON url`, bit for bit. The Bloom
  * filter only changes the execution shape, never the result — a url
  * the filter rejects is DEFINITELY unseen (Bloom filters have no
  * false negatives) and bypasses the join; the `mightContain` minority
  * (true dups + ~fpp of the rest) pays the exact anti-join, where
  * false positives are eliminated. Filter randomness therefore cannot
  * leak into the output, which is what makes the operator
  * constant-free ORACLE-comparable against a plain SQL anti-join.
  *
  * Scale shape (the reason this exists next to a plain anti-join):
  *  - the definite-new majority (a fresh crawl is mostly new urls)
  *    never shuffles at all — at 10^12 seen rows the anti-join's
  *    shuffle of the NEW side is gone for ~(1-dup-fpp) of the batch;
  *  - the exact join's SEEN side is pre-filtered by a second, tiny
  *    Bloom filter built over the candidate urls, so the historical
  *    index contributes ~|candidates| + fpp·|seen| rows to the shuffle
  *    instead of all 10^12 (the scan itself is unavoidable — membership
  *    needs the index — but scans are cheap next to shuffles, and the
  *    url column prunes to one parquet column);
  *  - both filters are budget-gated BEFORE construction: a filter
  *    whose sizing formula exceeds the byte budget raises immediately
  *    (the [[Similarity]] pre-collect discipline) instead of OOMing
  *    the driver. At |seen| beyond what one broadcast filter holds
  *    (~10^9 urls per GiB at 1% fpp), shard by url-hash bucket: build
  *    one filter per bucket over `seen` co-partitioned with the batch
  *    (each executor holds only its bucket's filter). That form is a
  *    composition of this one per bucket; the single-filter form is
  *    the right default for per-segment increments.
  */
object IncrementalDedup {

  /** Default byte budget for one broadcast Bloom filter (matches the
    * broadcast discipline used by [[Similarity]]). 256 MiB holds
    * ~2.2·10^8 urls at 1% fpp. */
  val DefaultFilterBudgetBytes: Long = 256L << 20

  /** Bytes the standard Bloom sizing formula allocates for n items at
    * the given fpp: m = -n·ln(p)/ln(2)^2 bits. */
  def filterBytes(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1) (got $fpp)")
    val bits = -n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))
    math.ceil(bits / 8.0).toLong
  }

  private def budgetGuard(n: Long, fpp: Double, budget: Long,
      side: String): Unit = {
    val bytes = filterBytes(math.max(n, 1L), fpp)
    require(bytes <= budget,
      s"$side Bloom filter for $n urls at fpp=$fpp needs $bytes bytes " +
        s"(budget $budget): shard the filter by url-hash bucket " +
        "(one filter per bucket over co-partitioned inputs) instead of " +
        "broadcasting one filter for the whole index")
  }

  private def mightContainCol(df: DataFrame, bf: BloomFilter,
      urlCol: String): Column = {
    val bfB = df.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((u: String) => u != null && bfB.value.mightContainString(u))
    probe(col(urlCol))
  }

  /** Rows of `newBatch` whose url does not appear in `seen` —
    * identical to `newBatch.join(seen, Seq(urlCol), "left_anti")` with
    * the Bloom-accelerated execution shape described on the object.
    *
    * @param expectedSeen pass the known |seen| url count to skip the
    *   sizing `count()` (e.g. from table metadata); -1 counts.
    */
  def newUrls(newBatch: DataFrame, seen: DataFrame,
              urlCol: String = "url",
              fpp: Double = 0.01,
              expectedSeen: Long = -1L,
              filterBudgetBytes: Long = DefaultFilterBudgetBytes)
      : DataFrame = {
    val seenUrls = seen.select(col(urlCol))
    val nSeen = if (expectedSeen > 0L) expectedSeen else seenUrls.count()
    budgetGuard(nSeen, fpp, filterBudgetBytes, "seen-side")
    val seenBf = seenUrls.stat.bloomFilter(urlCol, math.max(nSeen, 1L), fpp)

    val maybeSeen = mightContainCol(newBatch, seenBf, urlCol)
    // definite-new majority: filter rejection proves absence — no join,
    // no shuffle for these rows
    val definiteNew = newBatch.filter(!maybeSeen)
    val candidates = newBatch.filter(maybeSeen)

    // candidate-side filter (tiny: true dups + fpp of the batch) cuts
    // the seen side of the exact join from the whole index to
    // ~|candidates| + fpp·|seen| rows before the shuffle
    val nCand = candidates.select(col(urlCol)).count()
    budgetGuard(nCand, fpp, filterBudgetBytes, "candidate-side")
    val candBf = candidates.select(col(urlCol))
      .stat.bloomFilter(urlCol, math.max(nCand, 1L), fpp)
    val seenPruned = seenUrls.filter(mightContainCol(seenUrls, candBf, urlCol))

    // using-column joins move the key first; restore the batch's column
    // order so the union is positionally correct
    val checked = candidates.join(seenPruned, Seq(urlCol), "left_anti")
      .select(newBatch.columns.map(col).toIndexedSeq: _*)
    definiteNew.union(checked)
  }
}
