package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ExtractResult, Model, PageRow}

/** Dataset-level orchestration: salted partitioning, the typed map stage,
  * per-partition lineage + metrics, exactly-once resume (O7 — the analog of
  * the reference's Redis idempotency protocol, /root/reference/ocr_service/
  * modules/processor.py:121-207,295-312, realized as a lineage-table
  * anti-join + idempotent dynamic-partition overwrite).
  *
  * Scale notes (100 TB / 1000 executors):
  *  - ONE shuffle total: the salted url-hash repartition. The key is
  *    per-url, so host-level skew (many pages per hot host) cannot
  *    concentrate (SURVEY §4 item 3); bucket count scales with cluster
  *    size, independent of input file layout.
  *  - The extraction map is narrow after that shuffle; metrics are a
  *    map-side-combinable groupBy over the already-partitioned bucket
  *    column (no second wide shuffle of row data).
  *  - Resume filters by bucket id against the lineage table — a tiny
  *    broadcast (≤ buckets rows), not a row-level anti-join.
  */
object ExtractPipeline {

  val DefaultSalt = 0x9e3779b9

  /** Version of the url→bucket assignment, stamped into every lineage
    * commit row and enforced on resume. History: `bm1` keyed the
    * repartition on the pre-modded bucket id (the double-hash bug —
    * ~1/e of partitions empty); `bm2` keys on the full-cardinality
    * salted hash with bucket := pmod(hash(saltedHash), n). Bucket ids
    * MOVED between the two, so a run started under one version cannot
    * be resumed under the other — `run()` fails fast instead of
    * silently skipping wrong buckets and overwriting reused ids. Bump
    * this whenever the mapping expression, salt semantics, or
    * murmur3 seed change. */
  val BucketMappingVersion = "bm2"

  /** What pre-stamp lineage rows (no `bucket_mapping` column) report —
    * they were written by `bm1`-era builds. */
  val LegacyBucketMapping = "bm1-legacy"

  /** Deterministic synthetic pages (FIXTURES.md) as a typed Dataset;
    * generated independently per row — parallelizes with no shuffle. */
  def pages(spark: SparkSession, n: Long, partitions: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(i => PagesSynth.row(i))
  }

  /** Shuffle-volume pruning: the engine never reads the raw `text` side
    * channel (FIXTURES.md §1) — drop its bytes BEFORE the shuffle. On a
    * real Common-Crawl table `text` is comparable in size to `html`, so
    * this halves shuffle I/O. */
  private def pruneForShuffle(pagesDs: Dataset[PageRow]): Dataset[PageRow] = {
    val spark = pagesDs.sparkSession
    import spark.implicits._
    pagesDs.select(col("url"), col("warc_ts"), col("html"),
      lit("").as("text"), col("lang")).as[PageRow]
  }

  /** The typed map stage over salted url-hash buckets.
    *
    * The repartition key is the RAW salted hash, not `pmod(hash, n)`:
    * `repartition(n, expr)` re-hashes the expression value to pick the
    * partition, so a pre-modded key offers only n distinct values to
    * the partitioner and balls-into-bins empties ~1/e of the partitions
    * while stacking 2-4 buckets on others (measured: 3 of 8 partitions
    * empty, worst 191/500 docs). Keying on the full-cardinality hash
    * makes the partitioner's mod uniform over URLS. */
  def extract(pagesDs: Dataset[PageRow], buckets: Int,
      salt: Int = DefaultSalt): Dataset[ExtractResult] = {
    val spark = pagesDs.sparkSession
    import spark.implicits._
    pruneForShuffle(pagesDs)
      .repartition(buckets, hash(col("url"), lit(salt)))
      .mapPartitions(_.map(Extractor.extract))
  }

  /** Storage-agnostic lineage existence check: resolves through the
    * Hadoop FileSystem for the path's scheme, so resume works on
    * HDFS/S3A/ABFS/file:// alike (a bare `java.io.File` check is always
    * false off the local disk → every rerun would silently reprocess
    * everything — correct but not resume). */
  def lineageExists(spark: SparkSession, lineageDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(lineageDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  /** Persistence half of the O7 protocol, separated from the control
    * flow so an Iceberg-catalog sink can replace parquet without
    * rewriting `run()`: an Iceberg implementation maps `writeResults`
    * to `overwritePartitions()` (same idempotent-replay semantics the
    * dynamic-overwrite parquet write provides), `appendLineage` to a
    * table append, `committedBuckets` to a snapshot scan. */
  trait CommitProtocol {
    /** Bucket ids already committed for `runId` (resume filter). */
    def committedBuckets(spark: SparkSession, runId: String): Set[Int]
    /** Idempotent bucket-partitioned result write (replaying a bucket
      * must replace exactly its own output).
      *
      * CONTRACT (lineage exactly-once): `run()` counts per-bucket
      * lineage metrics with an accumulator inside the extraction map,
      * and Spark only guarantees once-per-task accumulator semantics in
      * the RESULT stage of a single action. An implementation must
      * therefore execute exactly ONE action over `results` and must not
      * request a redistribution (e.g. Iceberg's hash write distribution)
      * that pushes the extraction map into a ShuffleMapStage — there,
      * stage retries/speculation re-run map tasks and double-count
      * docs_in/docs_out/input_fingerprint. `results` arrives already
      * partitioned by `bucket`, so a fan-out-free v1/v2 write needs no
      * redistribution; a sink that must shuffle (or write twice) must
      * instead derive its lineage from the WRITTEN data and ignore the
      * accumulator (override [[trustAccumulatorLineage]] to false). */
    def writeResults(results: DataFrame): Unit
    /** Whether `writeResults` upholds the one-action/no-shuffle contract
      * above (accumulator lineage is trustworthy). Shuffling/multi-action
      * sinks return false; `run()` then stamps a `run_id` provenance
      * column into every written row and recomputes lineage from the
      * written results table filtered to this run's rows (stale
      * partitions from other runs can never be attributed to this
      * run's lineage). */
    def trustAccumulatorLineage: Boolean = true
    /** Distinct `bucket_mapping` stamps on `runId`'s existing lineage
      * rows. `run()` fails fast when any differs from
      * [[BucketMappingVersion]]: the url→bucket assignment changed
      * across builds, so resuming would silently skip the WRONG buckets
      * and dynamic-overwrite other-mapping files for reused bucket ids
      * — lost and duplicated docs with no error. Rows from before the
      * stamp existed must report [[LegacyBucketMapping]]; protocols
      * that cannot read their lineage back return Set.empty (check
      * skipped — weaker, documented). */
    def lineageMappingVersions(spark: SparkSession, runId: String)
        : Set[String] = Set.empty
    /** Written results as a DataFrame (lineage fallback source when
      * [[trustAccumulatorLineage]] is false); None when unsupported. */
    def readBackResults(spark: SparkSession): Option[DataFrame] = None
    /** Atomic-append of per-bucket lineage commit rows. */
    def appendLineage(lineage: DataFrame): Unit
  }

  /** Parquet implementation: dynamic partition overwrite + parquet
    * append. */
  final class ParquetCommitProtocol(outDir: String, lineageDir: String)
      extends CommitProtocol {
    def committedBuckets(spark: SparkSession, runId: String): Set[Int] = {
      import spark.implicits._
      if (lineageExists(spark, lineageDir)) {
        spark.read.parquet(lineageDir)
          .filter($"run_id" === runId)
          .select($"partition_id")
          .distinct()
          .as[Int]
          .collect()
          .toSet
      } else Set.empty
    }
    def writeResults(results: DataFrame): Unit = {
      results.sparkSession.conf
        .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      results.write
        .mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(outDir)
    }
    def appendLineage(lineage: DataFrame): Unit =
      lineage.write.mode(SaveMode.Append).parquet(lineageDir)
    override def lineageMappingVersions(spark: SparkSession, runId: String)
        : Set[String] = {
      import spark.implicits._
      if (!lineageExists(spark, lineageDir)) Set.empty
      else {
        val df = spark.read.parquet(lineageDir).filter($"run_id" === runId)
        mappingVersionsOf(df)
      }
    }
    override def readBackResults(spark: SparkSession): Option[DataFrame] =
      if (lineageExists(spark, outDir)) Some(spark.read.parquet(outDir))
      else None
  }

  /** Shared reader for the `bucket_mapping` stamp: rows predating the
    * stamp (column absent — including a parquet footer-schema read that
    * landed on a pre-stamp file) report [[LegacyBucketMapping]], which
    * correctly FAILS a resume across the mapping change. */
  private def mappingVersionsOf(runLineage: DataFrame): Set[String] = {
    if (runLineage.isEmpty) Set.empty
    else if (!runLineage.columns.contains("bucket_mapping"))
      Set(LegacyBucketMapping)
    else runLineage.select(col("bucket_mapping")).distinct()
      .collect().map(r => Option(r.getString(0))
        .getOrElse(LegacyBucketMapping)).toSet
  }

  /** Iceberg-catalog implementation (north rule: "per-partition
    * checkpoint commits into an Iceberg lineage/metrics table").
    *
    * Built entirely on the catalog-agnostic DataFrameWriterV2 API, so it
    * compiles against Spark alone; at runtime the table identifiers must
    * resolve to an Iceberg catalog (`spark.sql.catalog.<name> =
    * org.apache.iceberg.spark.SparkCatalog`) — the Iceberg runtime jar
    * is not in this sandbox, so the contract suite exercises these
    * semantics through the in-memory twin while ParquetCommitProtocol
    * covers the filesystem path end-to-end.
    *
    * Semantics vs parquet:
    *  - `writeResults` → `overwritePartitions()` on a table partitioned
    *    by `bucket`: replaces exactly the buckets present in the written
    *    frame (the same idempotent-replay contract as the parquet
    *    dynamic overwrite) and commits them as ONE atomic snapshot — a
    *    crash mid-write leaves the previous snapshot visible, which
    *    strengthens step 3 of the O7 crash protocol.
    *  - `appendLineage` → atomic append snapshot on the lineage table.
    *  - `committedBuckets` → scan of the lineage table's current
    *    snapshot. */
  final class IcebergCommitProtocol(resultsTable: String,
      lineageTable: String) extends CommitProtocol {
    def committedBuckets(spark: SparkSession, runId: String): Set[Int] = {
      import spark.implicits._
      if (!spark.catalog.tableExists(lineageTable)) Set.empty
      else spark.table(lineageTable)
        .filter($"run_id" === runId)
        .select($"partition_id")
        .distinct()
        .as[Int]
        .collect()
        .toSet
    }
    def writeResults(results: DataFrame): Unit = {
      val spark = results.sparkSession
      if (spark.catalog.tableExists(resultsTable))
        results.writeTo(resultsTable).overwritePartitions()
      else
        results.writeTo(resultsTable)
          .partitionedBy(org.apache.spark.sql.functions.col("bucket"))
          .create()
    }
    def appendLineage(lineage: DataFrame): Unit = {
      val spark = lineage.sparkSession
      if (spark.catalog.tableExists(lineageTable))
        lineage.writeTo(lineageTable).append()
      else
        lineage.writeTo(lineageTable).create()
    }
    /** Iceberg's `overwritePartitions` typically requests a hash write
      * distribution (`write.distribution-mode=hash` default since
      * Iceberg 1.2) — that extra shuffle pushes the extraction map into
      * a ShuffleMapStage where stage retries/speculation double-count
      * the lineage accumulator, so this sink derives lineage from the
      * committed snapshot instead. */
    override def trustAccumulatorLineage: Boolean = false
    override def lineageMappingVersions(spark: SparkSession, runId: String)
        : Set[String] = {
      import spark.implicits._
      if (!spark.catalog.tableExists(lineageTable)) Set.empty
      else mappingVersionsOf(
        spark.table(lineageTable).filter($"run_id" === runId))
    }
    override def readBackResults(spark: SparkSession): Option[DataFrame] =
      if (spark.catalog.tableExists(resultsTable))
        Some(spark.table(resultsTable))
      else None
  }

  final case class RunSummary(
      runId: String,
      bucketsTotal: Int,
      bucketsSkipped: Int,
      bucketsProcessed: Int,
      docsIn: Long,
      docsOut: Long)

  /** Checkpointed batch run.
    *
    * Protocol (crash-safe at any point):
    *  1. read lineage table → committed bucket ids for `runId`
    *  2. process only missing buckets
    *  3. write output with DYNAMIC partition overwrite keyed by bucket —
    *     a replayed bucket overwrites its own files (idempotent)
    *  4. append per-bucket lineage rows (docs_in, docs_out, bytes,
    *     extractor_version) — the commit record
    * A crash between 3 and 4 replays the bucket on rerun; step 3 makes the
    * replay idempotent, so the effect is exactly-once.
    */
  def run(
      spark: SparkSession,
      pagesDs: Dataset[PageRow],
      outDir: String,
      lineageDir: String,
      runId: String,
      buckets: Int,
      salt: Int = DefaultSalt,
      narrowOutput: Boolean = false): RunSummary =
    run(spark, pagesDs, new ParquetCommitProtocol(outDir, lineageDir),
      runId, buckets, salt, narrowOutput)

  /** Sink-agnostic variant: all persistence goes through `protocol`.
    *
    * Per-bucket lineage metrics are accumulated INSIDE the extraction map
    * stage (an AccumulatorV2 keyed by bucket), so the write action is the
    * only pass over the data — the previous implementation `.cache()`d
    * the full results Dataset to serve a second lineage aggregate, which
    * at 100 TB means a cluster-wide cache of the entire output (spill
    * pressure, eviction churn). Accumulator state is `buckets` small
    * structs, not row data; Spark applies action-stage accumulator
    * updates once per successful task, so retried tasks don't
    * double-count. */
  def run(
      spark: SparkSession,
      pagesDs: Dataset[PageRow],
      protocol: CommitProtocol,
      runId: String,
      buckets: Int,
      salt: Int): RunSummary =
    run(spark, pagesDs, protocol, runId, buckets, salt,
      narrowOutput = false)

  /** `narrowOutput = true` writes only (url, text, status, bytes_in,
    * bucket) — consumers that don't need fields/cards/analytics halve
    * their output bytes (at 10^12 docs the analytics structs are
    * roughly half the row). Resume/lineage semantics are identical in
    * both modes (bucket + the lineage-bearing columns survive the
    * projection). */
  def run(
      spark: SparkSession,
      pagesDs: Dataset[PageRow],
      protocol: CommitProtocol,
      runId: String,
      buckets: Int,
      salt: Int,
      narrowOutput: Boolean): RunSummary = {
    import spark.implicits._

    val committed: Set[Int] = protocol.committedBuckets(spark, runId)

    // resume safety: lineage committed under a DIFFERENT url→bucket
    // mapping makes `committed` meaningless — the same bucket id names
    // different urls across versions, so filtering by it would skip the
    // wrong documents and dynamic-overwrite other-mapping files for
    // reused ids (silent loss + duplication). Fail fast instead.
    if (committed.nonEmpty) {
      val foreign =
        protocol.lineageMappingVersions(spark, runId) - BucketMappingVersion
      require(foreign.isEmpty,
        s"run_id '$runId' has lineage committed under bucket-mapping " +
          s"version(s) ${foreign.mkString(", ")}, but this build maps " +
          s"urls with $BucketMappingVersion — resuming would skip the " +
          "wrong buckets. Finish the run with the original build, or " +
          "start a fresh run_id (reprocessing from scratch).")
    }

    // bucket = the PHYSICAL partition the repartition below will pick:
    // HashPartitioning(expr, n) assigns pmod(murmur3(expr), n), and SQL
    // hash() IS that murmur3 (seed 42) — so pmod(hash(saltedHash), n)
    // keeps bucket == partition id (one output file per bucket, the
    // commit/replay unit co-located in one task). Repartitioning on the
    // pre-modded bucket instead would re-hash n distinct values into n
    // partitions: ~1/e of them end up EMPTY and others hold 2-4 buckets
    // (measured 3-of-8 empty, a 191/500-doc straggler) — a silent
    // parallelism loss at every scale. NOTE: this mapping is part of
    // the lineage contract — resume a run only with the version that
    // started it (bucket ids moved when this fix landed).
    val saltedHash = hash(col("url"), lit(salt))
    val withBucket = pruneForShuffle(pagesDs)
      .withColumn("bucket", pmod(hash(saltedHash), lit(buckets)))

    val todo =
      if (committed.isEmpty) withBucket
      else withBucket.filter(!col("bucket").isin(committed.toSeq: _*))

    val acc = new BucketMetricsAcc
    spark.sparkContext.register(acc, s"graft.bucketMetrics.$runId")

    val wide = todo
      .repartition(buckets, saltedHash)
      .as[PageRowWithBucket]
      .mapPartitions { it =>
        it.map { r =>
          val res = Extractor.extract(r.toPageRow)
          acc.add((r.bucket, BucketMetrics(
            fingerprint = BucketMetrics.sparkUrlHash(r.url),
            docsIn = 1L,
            docsOut = if (res.status != "FAILED") 1L else 0L,
            bytes = res.bytes_in)))
          ResultWithBucket(res, r.bucket)
        }
      }
      .select(col("result.*"), col("bucket"))
    val projected =
      if (!narrowOutput) wide
      else wide.select(col("url"), col("text"), col("status"),
        col("bytes_in"), col("bucket"))
    // Sinks that derive lineage from the WRITTEN table (shuffling /
    // multi-action — trustAccumulatorLineage=false) get a run_id
    // provenance column stamped into every row: dynamic/partition
    // overwrite leaves a bucket's previous-run partition untouched when
    // this run writes zero rows for it, and without the stamp those
    // stale rows would be attributed to THIS run's lineage (phantom
    // commit rows with wrong fingerprints, then skipped on resume).
    val results =
      if (protocol.trustAccumulatorLineage) projected
      else projected.withColumn("run_id", lit(runId))

    // idempotent write: a replayed bucket replaces only its own output —
    // for a contract-upholding protocol this is the ONE action over the
    // full data (populates `acc` as it runs)
    acc.reset() // defensive: zero even if a prior action touched the plan
    protocol.writeResults(results)

    // per-bucket lineage/metrics commit rows: from the accumulator when
    // the sink upholds the one-action/no-shuffle contract, otherwise
    // recomputed from the WRITTEN data (a scan of the sink — immune to
    // map-stage retries/speculation double-counting the accumulator)
    val metrics: Seq[(String, Int, Long, Long, Long, Long, String)] =
      if (protocol.trustAccumulatorLineage) {
        val m = acc.value
        val b = Seq.newBuilder[(String, Int, Long, Long, Long, Long, String)]
        m.forEach { (bucket, bm) =>
          b += ((runId, bucket.intValue, bm.fingerprint, bm.docsIn,
            bm.docsOut, bm.bytes, Model.ExtractorVersion))
        }
        b.result().sortBy(_._2)
      } else {
        val written = protocol.readBackResults(spark).getOrElse(results)
        // scope strictly to rows THIS run produced: the run_id stamp
        // excludes stale partitions left by OTHER runs (the phantom-
        // commit hazard above); the committed filter excludes buckets
        // this same runId committed in an earlier invocation (their
        // lineage rows already exist). A re-executed `results` plan
        // (readBackResults = None) is this-run-only by construction but
        // carries the stamp too — the filter is a no-op there.
        val scoped =
          if (written.columns.contains("run_id"))
            written.filter(col("run_id") === runId)
          else written
        val thisRun =
          if (committed.isEmpty) scoped
          else scoped.filter(!col("bucket").isin(committed.toSeq: _*))
        thisRun
          .groupBy(col("bucket"))
          .agg(sum(hash(col("url")).cast("long")).as("fp"),
            count(lit(1)).as("docs_in"),
            sum(when(col("status") =!= "FAILED", 1L).otherwise(0L))
              .as("docs_out"),
            sum(col("bytes_in")).as("bytes"))
          .collect()
          .map(r => (runId, r.getInt(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), Model.ExtractorVersion))
          .toSeq.sortBy(_._2)
      }
    val lineage = metrics.toDF("run_id", "partition_id", "input_fingerprint",
      "docs_in", "docs_out", "bytes", "extractor_version")
      // the url→bucket mapping these partition_ids were computed under —
      // resume refuses lineage stamped with a different version
      .withColumn("bucket_mapping", lit(BucketMappingVersion))

    protocol.appendLineage(lineage)

    RunSummary(
      runId = runId,
      bucketsTotal = buckets,
      bucketsSkipped = committed.size,
      bucketsProcessed = metrics.size,
      docsIn = metrics.map(_._4).sum,
      docsOut = metrics.map(_._5).sum)
  }
}

/** Per-bucket lineage metrics (mergeable monoid). */
final case class BucketMetrics(
    fingerprint: Long, docsIn: Long, docsOut: Long, bytes: Long) {
  def merge(o: BucketMetrics): BucketMetrics = BucketMetrics(
    fingerprint + o.fingerprint, docsIn + o.docsIn,
    docsOut + o.docsOut, bytes + o.bytes)
}

object BucketMetrics {
  /** Same int32 as Spark's `hash(col)` (Murmur3, seed 42) on a string —
    * keeps `input_fingerprint` byte-identical to the previous
    * sum(hash(url)) lineage aggregate. Total function like Spark's
    * `hash()`: a null url folds the seed (42), it never throws — real
    * crawl inputs through the generic Dataset[PageRow] API can carry
    * null urls. */
  def sparkUrlHash(url: String): Long = {
    if (url == null) return 42L
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(url)
    org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42).toLong
  }
}

/** Bucket-keyed metrics accumulator — state is O(buckets), not O(rows). */
final class BucketMetricsAcc
    extends org.apache.spark.util.AccumulatorV2[
      (Int, BucketMetrics), java.util.HashMap[Integer, BucketMetrics]] {
  private val map = new java.util.HashMap[Integer, BucketMetrics]()
  override def isZero: Boolean = map.isEmpty
  override def copy(): BucketMetricsAcc = {
    val a = new BucketMetricsAcc
    a.map.putAll(map) // values are immutable case classes
    a
  }
  override def reset(): Unit = map.clear()
  override def add(v: (Int, BucketMetrics)): Unit =
    map.merge(v._1, v._2, (a, b) => a.merge(b))
  override def merge(other: org.apache.spark.util.AccumulatorV2[
      (Int, BucketMetrics), java.util.HashMap[Integer, BucketMetrics]]): Unit =
    other.value.forEach((k, v) => map.merge(k, v, (a, b) => a.merge(b)))
  override def value: java.util.HashMap[Integer, BucketMetrics] = map
}

/** Carrier rows for the bucketed map stage. */
final case class PageRowWithBucket(
    url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
    text: String, lang: String, bucket: Int) {
  def toPageRow: PageRow = PageRow(url, warc_ts, html, text, lang)
}

final case class ResultWithBucket(result: ExtractResult, bucket: Int)
