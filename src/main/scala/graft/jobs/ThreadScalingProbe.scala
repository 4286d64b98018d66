package graft.jobs

import graft.pipeline.{Extractor, PagesSynth}

/** Raw-kernel thread-scaling + allocation probe (no Spark): runs the
  * synth→extract loop on 1/4/16 plain threads over disjoint index
  * ranges and reports docs/s per level, N→4N efficiency, and allocated
  * bytes per document (ThreadMXBean) — separates a genuine kernel
  * allocation/bandwidth ceiling from Spark scheduling/shuffle effects.
  * Tooling main, not library surface.
  *
  * Usage: sbt "runMain graft.jobs.ThreadScalingProbe [docsPerLevel]"
  */
object ThreadScalingProbe {

  private val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    .asInstanceOf[com.sun.management.ThreadMXBean]

  /** Run `total` docs split over `threads` threads; (sec, bytesAllocated). */
  private def run(threads: Int, total: Long, synth: Boolean,
      rows: Array[graft.model.PageRow]): (Double, Long) = {
    val alloc = new java.util.concurrent.atomic.AtomicLong(0)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val per = total / threads
    val t0 = System.nanoTime()
    val ths = (0 until threads).map { t =>
      new Thread(() => {
        val a0 = tmx.getThreadAllocatedBytes(Thread.currentThread().getId)
        var i = t * per
        val end = (t + 1) * per
        var s = 0L
        while (i < end) {
          val row = if (synth) PagesSynth.row(i) else rows((i % rows.length).toInt)
          s += Extractor.extract(row).text.length
          i += 1
        }
        sink.addAndGet(s)
        alloc.addAndGet(
          tmx.getThreadAllocatedBytes(Thread.currentThread().getId) - a0)
      })
    }
    ths.foreach(_.start())
    ths.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink.get == 42) println("x") // defeat DCE
    (sec, alloc.get)
  }

  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 48000L
    val preRows = (0L until 4000L).map(PagesSynth.row).toArray
    // warm
    run(16, 16000, synth = true, preRows)
    for (round <- 0 until 3; synth <- Seq(true, false)) {
      val label = if (synth) "synth+extract" else "extract-only "
      val rates = (Seq(1, 4, 16)).map { t =>
        val (sec, alloc) = run(t, docs, synth, preRows)
        val rate = docs / sec
        println(f"[tscale] round=$round $label t=$t%-2d ${rate}%9.1f docs/s  " +
          f"${alloc / docs}%6d B/doc")
        t -> rate
      }.toMap
      println(f"[tscale] round=$round $label eff 4->16: " +
        f"${rates(16) / (4 * rates(4))}%.3f   1->16: ${rates(16) / (16 * rates(1))}%.3f")
    }
  }
}
