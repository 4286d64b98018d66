package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Structured-Streaming shape: file-source backlog → extraction →
  * parquet sink with checkpoint; watermarked dedup + windowed metrics. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("available-now stream extracts the backlog exactly once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream").toString
    val inDir = base + "/in"
    val outDir = base + "/out"
    val ckDir = base + "/ck"
    // stage a backlog with a duplicated url (same url+ts)
    val pages = graft.pipeline.ExtractPipeline.pages(spark, 100, 2)
    pages.union(pages.limit(5)).write.parquet(inDir)

    val stream = StreamingExtract.readPages(spark, inDir)
    val results = StreamingExtract.extract(stream)
    val q = StreamingExtract.writer(results, outDir, ckDir).start()
    q.awaitTermination(120000)

    val out = spark.read.parquet(outDir)
    assert(out.count() == 100) // dups dropped
    assert(out.select("url").distinct().count() == 100)

    // restart with same checkpoint: no new data → no new rows
    val q2 = StreamingExtract.writer(
      StreamingExtract.extract(StreamingExtract.readPages(spark, inDir)),
      outDir, ckDir).start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == 100)

    // incremental run (the StreamJob contract): files landing between
    // runs are drained; already-processed files are not re-read
    spark.range(100L, 120L, 1L, 2)
      .map(i => graft.pipeline.PagesSynth.row(i))
      .write.mode("append").parquet(inDir)
    val q3 = StreamingExtract.writer(
      StreamingExtract.extract(StreamingExtract.readPages(spark, inDir)),
      outDir, ckDir).start()
    q3.awaitTermination(60000)
    val out3 = spark.read.parquet(outDir)
    assert(out3.count() == 120)
    assert(out3.select("url").distinct().count() == 120)
  }

  test("stateful first-seen dedup holds state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val source = MemoryStream[graft.model.PageRow]
    val deduped = StatefulDedup.firstSeen(source.toDS())
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // batch 1: rows 0-9; batch 2: rows 5-14 (overlap must be suppressed)
    source.addData((0L until 10L).map(ExtractPipelineRows.row))
    q.processAllAvailable()
    source.addData((5L until 15L).map(ExtractPipelineRows.row))
    q.processAllAvailable()
    val urls = spark.sql("SELECT url FROM dedup_out").as[String].collect()
    assert(urls.length == 15)
    assert(urls.distinct.length == 15)
    q.stop()
  }

  test("windowed metrics aggregate docs per event-time window") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream2").toString
    val inDir = base + "/in"
    graft.pipeline.ExtractPipeline.pages(spark, 200, 2).write.parquet(inDir)
    val m = StreamingExtract.metrics(StreamingExtract.readPages(spark, inDir))
    val q = m.writeStream.outputMode("complete")
      .format("memory").queryName("m_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT sum(docs) FROM m_out").as[Long].collect()
    assert(rows(0) == 200)
  }
}

/** Tiny alias so the spec reads clearly. */
object ExtractPipelineRows {
  def row(i: Long): graft.model.PageRow = graft.pipeline.PagesSynth.row(i)
}
