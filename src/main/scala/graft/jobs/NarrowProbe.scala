package graft.jobs

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for the narrow-output write path: times
  * ExtractPipeline.run in wide and narrow mode, interleaved in both
  * orders, on a materialized page table — plus plan dumps.
  * Usage: runMain graft.jobs.NarrowProbe [nPages] */
object NarrowProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 120000L
    // mirror graft.Bench's session profile exactly
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-nprobe-local")
      .config("spark.shuffle.compress", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.shuffle.unsafe.file.output.buffer", "4m")
      .config("spark.reducer.maxSizeInFlight", "128m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tbl = "/dev/shm/graft-nprobe-pages"
    graft.pipeline.ExtractPipeline.pages(spark, n, 64)
      .write.mode("overwrite").parquet(tbl)
    val pages = spark.read.parquet(tbl).as[graft.model.PageRow]

    def del(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => del(c.getPath))
      f.delete()
    }
    def once(narrow: Boolean, tag: String): Double = {
      val out = s"/dev/shm/graft-nprobe-out-$tag"
      val lin = s"/dev/shm/graft-nprobe-lin-$tag"
      del(out); del(lin)
      val t0 = System.nanoTime()
      graft.pipeline.ExtractPipeline.run(spark, pages, out, lin,
        s"np-$tag", 128, graft.pipeline.ExtractPipeline.DefaultSalt,
        narrowOutput = narrow)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[np] narrow=$narrow%-5s $sec%7.2f s  (${n / sec}%8.1f docs/s)")
      del(out); del(lin)
      sec
    }
    once(narrow = false, "warmw")
    once(narrow = true, "warmn")
    for (r <- 0 until 2) {
      once(narrow = true, s"n$r")
      once(narrow = false, s"w$r")
    }
    spark.stop()
    del(tbl)
  }
}
