package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** End-to-end Spark pipeline: golden determinism, skew-salted partitioning,
  * lineage + exactly-once resume (the analog of the reference's idempotency
  * tests, /root/reference/ocr_service/tests/test_worker_idempotency.py,
  * test_processor_idempotency_redis_failure.py). */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("pages dataset is deterministic and partition-independent") {
    import spark.implicits._
    val a = ExtractPipeline.pages(spark, 200, 4)
      .map(p => (p.url, p.html.length)).collect().sortBy(_._1)
    val b = ExtractPipeline.pages(spark, 200, 7)
      .map(p => (p.url, p.html.length)).collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("extract produces one result per page, byte-identical across runs") {
    import spark.implicits._
    val pages = ExtractPipeline.pages(spark, 200, 4)
    val r1 = ExtractPipeline.extract(pages, 8)
      .map(r => (r.url, r.text, r.document_type, r.status))
      .collect().sortBy(_._1)
    val r2 = ExtractPipeline.extract(ExtractPipeline.pages(spark, 200, 3), 5)
      .map(r => (r.url, r.text, r.document_type, r.status))
      .collect().sortBy(_._1)
    assert(r1.length == 200)
    assert(r1.sameElements(r2)) // byte-identical per url, any partitioning
    assert(r1.count(_._4 != "FAILED") > 100)
  }

  test("bucket equals physical partition; no empty partitions") {
    // the run() shuffle contract: bucket = pmod(hash(saltedHash), n)
    // must be exactly the partition HashPartitioning picks for the
    // saltedHash key (one task per bucket, one output file per bucket),
    // and keying the partitioner on the full-cardinality hash must
    // leave no partition empty (a pre-modded key loses ~1/e of the
    // partitions to balls-into-bins and stacks 2-4 buckets on others)
    import org.apache.spark.sql.functions._
    val pages = ExtractPipeline.pages(spark, 500, 8).toDF()
    val sh = hash(col("url"), lit(ExtractPipeline.DefaultSalt))
    val df = pages.withColumn("bucket", pmod(hash(sh), lit(8)))
      .repartition(8, sh)
    val perPartition = df.select(col("bucket")).rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_.getInt(0)).toSet)))
      .collect()
    assert(perPartition.forall { case (i, s) => s == Set(i) },
      perPartition.map { case (i, s) => s"$i->${s.mkString("/")}" }.mkString(","))
    // extract() (no bucket column) must also fill every partition
    val sizes = ExtractPipeline.extract(
        ExtractPipeline.pages(spark, 500, 8), 8).toDF()
      .rdd.mapPartitionsWithIndex((i, it) => Iterator(it.size)).collect()
    assert(sizes.forall(_ > 0), sizes.mkString(","))
  }

  test("full run writes output + lineage; rerun is a no-op") {
    val out = tmp() + "/out"
    val lin = tmp() + "/lineage"
    val pages = ExtractPipeline.pages(spark, 300, 4)
    val s1 = ExtractPipeline.run(spark, pages, out, lin, "run1", buckets = 8)
    assert(s1.bucketsProcessed == 8)
    assert(s1.docsIn == 300)
    val count1 = spark.read.parquet(out).count()
    assert(count1 == 300)

    // rerun: everything committed → nothing processed, output unchanged
    val s2 = ExtractPipeline.run(spark, pages, out, lin, "run1", buckets = 8)
    assert(s2.bucketsSkipped == 8)
    assert(s2.bucketsProcessed == 0)
    assert(spark.read.parquet(out).count() == 300)
  }

  test("narrow output mode writes 5 columns; resume still exactly-once") {
    val out = tmp() + "/out"
    val lin = tmp() + "/lineage"
    val pages = ExtractPipeline.pages(spark, 300, 4)
    val s1 = ExtractPipeline.run(spark, pages, out, lin, "runN", buckets = 8,
      narrowOutput = true)
    assert(s1.bucketsProcessed == 8 && s1.docsIn == 300)
    val df = spark.read.parquet(out)
    assert(df.columns.sorted.toSeq ==
      Seq("bucket", "bytes_in", "status", "text", "url"))
    assert(df.count() == 300)
    // rerun: no-op resume, identical in narrow mode
    val s2 = ExtractPipeline.run(spark, pages, out, lin, "runN", buckets = 8,
      narrowOutput = true)
    assert(s2.bucketsSkipped == 8 && s2.bucketsProcessed == 0)
    assert(spark.read.parquet(out).count() == 300)
    // text identical to the wide mode's for the same input
    import spark.implicits._
    val narrowTexts = df.select($"url", $"text").as[(String, String)]
      .collect().sortBy(_._1)
    val wideTexts = ExtractPipeline.extract(pages, 8)
      .map(r => (r.url, r.text)).collect().sortBy(_._1)
    assert(narrowTexts.sameElements(wideTexts))
  }

  test("kill-after-partial-commit resume: no duplicates, no loss") {
    import spark.implicits._
    val base = tmp()
    val out = base + "/out"
    val lin = base + "/lineage"
    val pages = ExtractPipeline.pages(spark, 300, 4)

    // simulate a partial run: process only buckets 0-3, commit their lineage
    val full = ExtractPipeline.run(spark, pages, out, lin, "runX", buckets = 8)
    assert(full.docsIn == 300)
    // forge a partial state: drop lineage rows for buckets 4-7 and delete
    // their output partitions (as if the job died before committing them)
    val lineage = spark.read.parquet(lin)
    val partial = lineage.filter($"partition_id" < 4)
    val lin2 = base + "/lineage2"
    partial.write.parquet(lin2)

    // resume from the partial lineage
    val s = ExtractPipeline.run(spark, pages, out, lin2, "runX", buckets = 8)
    assert(s.bucketsSkipped == 4)
    assert(s.bucketsProcessed == 4)

    val result = spark.read.parquet(out)
    assert(result.count() == 300) // no loss
    assert(result.select("url").distinct().count() == 300) // no dups
    // lineage now covers all 8 buckets exactly once
    val lineageAfter = spark.read.parquet(lin2)
      .filter($"run_id" === "runX").select("partition_id").distinct().count()
    assert(lineageAfter == 8)
  }

  test("replayed bucket overwrites idempotently (crash between write+commit)") {
    import spark.implicits._
    val base = tmp()
    val out = base + "/out"
    val lin = base + "/lineage"
    val pages = ExtractPipeline.pages(spark, 200, 4)
    // first full run, but throw away ALL lineage (simulates crash after
    // output write, before any lineage commit)
    ExtractPipeline.run(spark, pages, out, lin, "runY", buckets = 4)
    val linEmpty = base + "/lineage-empty"
    // rerun with empty lineage: every bucket replays, dynamic overwrite
    // must leave exactly one copy per url
    val s = ExtractPipeline.run(spark, pages, out, linEmpty, "runY", buckets = 4)
    assert(s.bucketsProcessed == 4)
    val result = spark.read.parquet(out)
    assert(result.count() == 200)
    assert(result.select("url").distinct().count() == 200)
  }

  test("extraction plan has exactly ONE exchange (the salted repartition)") {
    val plan = ExtractPipeline.extract(
      ExtractPipeline.pages(spark, 50, 2), 4).toDF()
      .queryExecution.executedPlan.toString
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle exchange, plan:\n$plan")
  }

  test("lineage rows carry metrics columns") {
    val base = tmp()
    val pages = ExtractPipeline.pages(spark, 100, 2)
    ExtractPipeline.run(spark, pages, base + "/o", base + "/l", "runM", 4)
    val lineage = spark.read.parquet(base + "/l")
    assert(lineage.columns.toSet == Set("run_id", "partition_id",
      "input_fingerprint", "docs_in", "docs_out", "bytes",
      "extractor_version", "bucket_mapping"))
    assert(lineage.select("bucket_mapping").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(ExtractPipeline.BucketMappingVersion))
    import spark.implicits._
    val total = lineage.agg(org.apache.spark.sql.functions.sum("docs_in"))
      .as[Long].collect()(0)
    assert(total == 100)
  }
}
