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

  // NOTE: the TTL tests CANNOT use processAllAvailable():
  // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
  // true under ProcessingTimeTimeout (the engine keeps scheduling
  // batches to fire timers), so noNewData is never set and
  // processAllAvailable blocks forever. They poll the memory sink with
  // a deadline instead — the continuously-running batches both drain
  // new data and fire due timeouts on their own.
  private def awaitSinkCount(table: String, n: Long,
      timeoutMs: Long = 60000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (spark.sql(s"SELECT 1 FROM $table").count() < n) {
      if (System.nanoTime() > deadline)
        fail(s"timed out waiting for $n rows in $table " +
          s"(have ${spark.sql(s"SELECT 1 FROM $table").count()})")
      Thread.sleep(50)
    }
  }

  test("stateFn: a claim whose TTL elapsed re-admits before the timeout fires") {
    // The race the r08 ADVICE fix covers: a duplicate arriving AFTER
    // the claim's TTL elapsed but BEFORE Spark fires the timeout must
    // be re-admitted as first-seen (Redis SET NX EX semantics), not
    // suppressed under a re-armed remainder. Driven clock-controlled
    // through TestGroupState — a real stream can't hit this window
    // deterministically.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import scala.concurrent.duration._
    val fn = StatefulDedup.stateFn(Some(2.seconds))
    val row = ExtractPipelineRows.row(0L)
    // claim made at t=1000ms; duplicate arrives at t=3500ms (> TTL
    // 2000ms after the claim) with the timeout not yet fired
    val state = TestGroupState.create[Long](
      Optional.of(1000L), GroupStateTimeout.ProcessingTimeTimeout,
      3500L, Optional.of(java.lang.Long.valueOf(3000L)), false)
    val out = fn("u", Iterator(row), state).toSeq
    assert(out == Seq(row), "expired claim must re-admit the url")
    assert(state.get == 3500L, "claim clock must reset to now")
    // within the window (t=1500ms): suppressed, remainder re-armed
    val state2 = TestGroupState.create[Long](
      Optional.of(1000L), GroupStateTimeout.ProcessingTimeTimeout,
      1500L, Optional.of(java.lang.Long.valueOf(3000L)), false)
    val out2 = fn("u", Iterator(row), state2).toSeq
    assert(out2.isEmpty, "in-window duplicate must drop")
    assert(state2.get == 1000L, "in-window duplicate must not extend the claim")
  }

  test("first-seen TTL: an expired claim re-admits its url") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.concurrent.duration._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[graft.model.PageRow]
    val deduped = StatefulDedup.firstSeen(source.toDS(), ttl = Some(2.seconds))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_ttl_out").start()
    // t≈0: url 0 claims
    source.addData(ExtractPipelineRows.row(0L))
    awaitSinkCount("dedup_ttl_out", 1)
    val t0 = System.nanoTime()
    def sleepUntil(ms: Long): Unit = {
      val left = ms - (System.nanoTime() - t0) / 1000000L
      if (left > 0) Thread.sleep(left)
    }
    // well inside the claim: the duplicate must drop
    source.addData(ExtractPipelineRows.row(0L))
    sleepUntil(1000)
    assert(spark.sql("SELECT url FROM dedup_ttl_out").count() == 1)
    // past expiry the engine's own timeout batch removed the state —
    // the next arrival of url 0 is first-seen again
    sleepUntil(3000)
    source.addData(ExtractPipelineRows.row(0L))
    awaitSinkCount("dedup_ttl_out", 2)
    val urls = spark.sql("SELECT url FROM dedup_ttl_out").as[String].collect()
    assert(urls.toSeq == Seq.fill(2)(ExtractPipelineRows.row(0L).url))
    q.stop()
  }

  test("first-seen TTL: duplicates do not extend the claim") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.concurrent.duration._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[graft.model.PageRow]
    val deduped = StatefulDedup.firstSeen(source.toDS(), ttl = Some(3.seconds))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_ttl2_out").start()
    // t≈0: url 0 claims (real expiry ≈ t+3.0s)
    source.addData(ExtractPipelineRows.row(0L))
    awaitSinkCount("dedup_ttl2_out", 1)
    val t0 = System.nanoTime()
    def sleepUntil(ms: Long): Unit = {
      val left = ms - (System.nanoTime() - t0) / 1000000L
      if (left > 0) Thread.sleep(left)
    }
    // t≈1.5s: duplicate — a naive implementation RESETS the timeout
    // here (expiry would move to ≈4.5s); ours re-arms only the
    // REMAINDER of the original claim (expiry stays ≈3.0s)
    sleepUntil(1500)
    source.addData(ExtractPipelineRows.row(0L))
    // t≈3.8s: past the original expiry (timer fired, state removed)
    // but BEFORE the naive duplicate-extended expiry — url 0 must be
    // re-admitted; under extended semantics it would still be claimed
    // and the sink would stay at 1 row (awaitSinkCount times out)
    sleepUntil(3800)
    source.addData(ExtractPipelineRows.row(0L))
    awaitSinkCount("dedup_ttl2_out", 2, timeoutMs = 20000L)
    val urls = spark.sql("SELECT url FROM dedup_ttl2_out").as[String].collect()
    assert(urls.count(_ == ExtractPipelineRows.row(0L).url) == 2,
      s"duplicate extended the claim (rows=${urls.toSeq})")
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
