package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.file.Files

/** Contract suite for [[ExtractPipeline.CommitProtocol]]: any
  * implementation must provide (1) exactly-once resume — committed
  * buckets are skipped on rerun, (2) idempotent replay — re-writing a
  * bucket replaces its previous output, never duplicates it, (3)
  * lineage completeness. Run against the parquet implementation and an
  * in-memory twin of an atomic table catalog (the semantics
  * IcebergCommitProtocol maps onto `overwritePartitions()`/`append()` —
  * the Iceberg runtime itself is not in this sandbox). */
class CommitProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-protocol-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Per-implementation handle: a shared results store that survives
    * `resetLineage()` (which simulates losing every commit record). */
  private trait Harness {
    def protocol: ExtractPipeline.CommitProtocol
    def resetLineage(): Unit
    def outCount(): Long
    def outDistinctUrls(): Long
  }

  /** Atomic-table twin: per-bucket replace on write, append-only
    * lineage — the same contract IcebergCommitProtocol gets from
    * overwritePartitions()/append(). */
  private class InMemoryProtocol extends ExtractPipeline.CommitProtocol {
    val store = scala.collection.mutable.Map.empty[Int, Array[Row]]
    val lineage = scala.collection.mutable.ArrayBuffer.empty[Row]
    var schema: org.apache.spark.sql.types.StructType = _
    def committedBuckets(spark: SparkSession, runId: String): Set[Int] =
      lineage.filter(_.getAs[String]("run_id") == runId)
        .map(_.getAs[Int]("partition_id")).toSet
    def writeResults(results: DataFrame): Unit = {
      schema = results.schema
      results.collect().groupBy(_.getAs[Int]("bucket"))
        .foreach { case (b, rows) => store(b) = rows } // replace, not append
    }
    def appendLineage(l: DataFrame): Unit = lineage ++= l.collect()
    override def lineageMappingVersions(spark: SparkSession, runId: String)
        : Set[String] =
      lineage.filter(_.getAs[String]("run_id") == runId).map { r =>
        if (r.schema.fieldNames.contains("bucket_mapping"))
          r.getAs[String]("bucket_mapping")
        else ExtractPipeline.LegacyBucketMapping
      }.toSet
  }

  private def inMemoryHarness(): Harness = new Harness {
    private val p = new InMemoryProtocol
    val protocol: ExtractPipeline.CommitProtocol = p
    def resetLineage(): Unit = p.lineage.clear()
    def outCount(): Long = p.store.values.map(_.length.toLong).sum
    def outDistinctUrls(): Long =
      p.store.values.flatten.map(_.getAs[String]("url")).toSet.size.toLong
  }

  private def parquetHarness(): Harness = new Harness {
    private val base = Files.createTempDirectory("graft-proto").toString
    private var gen = 0
    // delegate to a per-generation ParquetCommitProtocol so
    // resetLineage() can forget all commit records while the output
    // directory survives (the crash-between-write-and-commit shape)
    private def current = new ExtractPipeline.ParquetCommitProtocol(
      base + "/out", base + s"/lin$gen")
    val protocol: ExtractPipeline.CommitProtocol =
      new ExtractPipeline.CommitProtocol {
        def committedBuckets(s: SparkSession, runId: String): Set[Int] =
          current.committedBuckets(s, runId)
        def writeResults(results: DataFrame): Unit =
          current.writeResults(results)
        def appendLineage(l: DataFrame): Unit = current.appendLineage(l)
        override def lineageMappingVersions(s: SparkSession, runId: String)
            : Set[String] = current.lineageMappingVersions(s, runId)
      }
    def resetLineage(): Unit = gen += 1
    def outCount(): Long = spark.read.parquet(base + "/out").count()
    def outDistinctUrls(): Long =
      spark.read.parquet(base + "/out").select("url").distinct().count()
  }

  for ((name, mk) <- Seq(
      "in-memory atomic-table twin" -> (() => inMemoryHarness()),
      "parquet dynamic-overwrite" -> (() => parquetHarness()))) {
    test(s"commit protocol contract: $name") {
      val h = mk()
      val pages = ExtractPipeline.pages(spark, 240, 4)

      // 1) fresh run processes every bucket
      val s1 = ExtractPipeline.run(spark, pages, h.protocol, "runC", 6,
        ExtractPipeline.DefaultSalt)
      assert(s1.bucketsProcessed == 6 && s1.docsIn == 240)
      assert(h.outCount() == 240)

      // 2) exactly-once resume: rerun is a no-op
      val s2 = ExtractPipeline.run(spark, pages, h.protocol, "runC", 6,
        ExtractPipeline.DefaultSalt)
      assert(s2.bucketsSkipped == 6 && s2.bucketsProcessed == 0)
      assert(h.outCount() == 240)

      // 3) idempotent replay: lose ALL commit records (crash between
      // write and lineage append) → full replay must leave one copy
      h.resetLineage()
      val s3 = ExtractPipeline.run(spark, pages, h.protocol, "runC", 6,
        ExtractPipeline.DefaultSalt)
      assert(s3.bucketsProcessed == 6)
      assert(h.outCount() == 240, "replay must replace, not append")
      assert(h.outDistinctUrls() == 240)
    }
  }

  /** InMemoryProtocol variant that breaks the one-action/no-shuffle
    * contract (trustAccumulatorLineage=false) and serves read-back. */
  private class DerivedInMemoryProtocol extends InMemoryProtocol {
    override def trustAccumulatorLineage: Boolean = false
    override def readBackResults(s: SparkSession): Option[DataFrame] =
      if (store.isEmpty) None
      else {
        val rows = new java.util.ArrayList[Row]()
        store.values.flatten.foreach(rows.add)
        Some(s.createDataFrame(rows, schema))
      }
  }

  test("derived lineage (shuffling sink) matches accumulator lineage") {
    // a sink that breaks the one-action/no-shuffle contract sets
    // trustAccumulatorLineage=false; run() must then recompute lineage
    // from the WRITTEN data and land on identical per-bucket metrics
    val pages = ExtractPipeline.pages(spark, 240, 4)
    val pAcc = new InMemoryProtocol
    ExtractPipeline.run(spark, pages, pAcc, "runL", 6,
      ExtractPipeline.DefaultSalt)
    val pDerived = new DerivedInMemoryProtocol
    val sum = ExtractPipeline.run(spark, pages, pDerived, "runL", 6,
      ExtractPipeline.DefaultSalt)
    assert(sum.docsIn == 240)
    def key(r: Row) = (r.getAs[Int]("partition_id"),
      r.getAs[Long]("input_fingerprint"), r.getAs[Long]("docs_in"),
      r.getAs[Long]("docs_out"), r.getAs[Long]("bytes"))
    assert(pDerived.lineage.map(key).toSet == pAcc.lineage.map(key).toSet,
      s"derived=${pDerived.lineage}\nacc=${pAcc.lineage}")
  }

  test("derived lineage never attributes stale rows from another run") {
    // phantom-commit hazard: dynamic overwrite leaves a bucket's
    // previous-run partition untouched when the current run writes
    // zero rows for it — the derived-lineage fallback must NOT
    // attribute those stale rows to the current run_id
    val p = new DerivedInMemoryProtocol
    ExtractPipeline.run(spark, ExtractPipeline.pages(spark, 120, 4), p,
      "runOld", 6, ExtractPipeline.DefaultSalt)
    assert(p.lineage.nonEmpty)
    val before = p.lineage.size
    // a new run over an EMPTY input writes zero rows into every bucket;
    // the store still holds runOld's rows (overwrite touched nothing)
    val sum = ExtractPipeline.run(spark,
      ExtractPipeline.pages(spark, 0, 1), p,
      "runNew", 6, ExtractPipeline.DefaultSalt)
    assert(sum.docsIn == 0)
    assert(!p.lineage.exists(_.getAs[String]("run_id") == "runNew"),
      s"phantom lineage rows: ${p.lineage}")
    assert(p.lineage.size == before)
    // written rows carry the provenance stamp
    assert(p.store.values.flatten.forall(
      _.getAs[String]("run_id") == "runOld"))
  }

  test("null url never throws in the lineage fingerprint") {
    // total-function parity with Spark's hash(): null folds the seed
    assert(BucketMetrics.sparkUrlHash(null) == 42L)
    import spark.implicits._
    val sparkNull = spark.range(1)
      .select(org.apache.spark.sql.functions.hash(
        org.apache.spark.sql.functions.lit(null
          .asInstanceOf[String])).cast("long").as("h"))
      .as[Long].collect()(0)
    assert(BucketMetrics.sparkUrlHash(null) == sparkNull)
  }

  test("iceberg protocol reads committed buckets from the lineage table") {
    // catalog-independent half of IcebergCommitProtocol: a missing
    // lineage table means nothing is committed (fresh run), and the
    // bucket filter keys on run_id (runtime write path needs the
    // Iceberg catalog jar — not in this sandbox)
    val p = new ExtractPipeline.IcebergCommitProtocol(
      "nosuch.results_table", "nosuch.lineage_table")
    assert(p.committedBuckets(spark, "runZ").isEmpty)
    assert(p.lineageMappingVersions(spark, "runZ").isEmpty)
  }

  test("resume refuses lineage from a different bucket mapping") {
    import org.apache.spark.sql.functions._
    val pages = ExtractPipeline.pages(spark, 60, 2)

    // a) foreign stamp: lineage rows carry an older mapping version
    val baseA = Files.createTempDirectory("graft-proto-bm").toString
    val pA = new ExtractPipeline.ParquetCommitProtocol(
      baseA + "/out", baseA + "/lin")
    ExtractPipeline.run(spark, pages, pA, "runM", 4,
      ExtractPipeline.DefaultSalt)
    assert(pA.lineageMappingVersions(spark, "runM") ==
      Set(ExtractPipeline.BucketMappingVersion))
    spark.read.parquet(baseA + "/lin")
      .withColumn("run_id", lit("runOld"))
      .withColumn("bucket_mapping", lit("bm1"))
      .write.mode("append").parquet(baseA + "/lin")
    val eA = intercept[IllegalArgumentException] {
      ExtractPipeline.run(spark, pages, pA, "runOld", 4,
        ExtractPipeline.DefaultSalt)
    }
    assert(eA.getMessage.contains("bucket-mapping"))

    // b) pre-stamp lineage (column absent entirely) reports the legacy
    // version and refuses too
    val baseB = Files.createTempDirectory("graft-proto-bm2").toString
    val pB = new ExtractPipeline.ParquetCommitProtocol(
      baseB + "/out", baseB + "/lin")
    spark.read.parquet(baseA + "/lin")
      .filter(col("run_id") === "runM")
      .drop("bucket_mapping")
      .write.parquet(baseB + "/lin")
    assert(pB.lineageMappingVersions(spark, "runM") ==
      Set(ExtractPipeline.LegacyBucketMapping))
    val eB = intercept[IllegalArgumentException] {
      ExtractPipeline.run(spark, pages, pB, "runM", 4,
        ExtractPipeline.DefaultSalt)
    }
    assert(eB.getMessage.contains(ExtractPipeline.LegacyBucketMapping))

    // c) same-version resume is still the exactly-once no-op
    val s = ExtractPipeline.run(spark, pages, pA, "runM", 4,
      ExtractPipeline.DefaultSalt)
    assert(s.bucketsSkipped == 4 && s.bucketsProcessed == 0)
  }
}
