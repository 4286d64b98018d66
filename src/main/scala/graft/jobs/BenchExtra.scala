package graft.jobs

import org.apache.spark.sql.SparkSession

/** Extra benchmark harness for the optimization rounds (guide §1.4):
  * times individual queries from `SparkEntry.queries` with EXACTLY the
  * session configuration and methodology `graft.Bench` uses for its
  * query section (full warm pass over the selected set, then the
  * per-query MIN over two timed passes), without paying the 15-minute
  * scaling/sink sections — the iteration tool behind the numbers cited
  * in OPTIMIZATION_r08.md. `Bench.scala` itself is frozen.
  *
  * Usage:
  *   sbt "runMain graft.jobs.BenchExtra <sfDir> [query...]"
  *   sbt "runMain graft.jobs.BenchExtra <sfDir> --plans <outDir> [query...]"
  *
  * With `--plans`, additionally writes `<outDir>/<query>.txt` with the
  * `.explain("formatted")` output of each selected query (the artifact
  * committed under plans/r08/).
  */
object BenchExtra {

  /** Same knobs as Bench.session (frozen there; duplicated here so the
    * extra harness measures what the driver's bench will measure). */
  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-extra-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-bench")
    b.config("spark.shuffle.compress", "true")
    b.config("spark.io.compression.codec", "zstd")
    b.config("spark.shuffle.file.buffer", "1m")
    b.config("spark.shuffle.unsafe.file.output.buffer", "4m")
    b.config("spark.reducer.maxSizeInFlight", "128m")
    b.config("spark.sql.files.maxPartitionBytes", "16m")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var rest = args.drop(1).toSeq
    val plansOut = rest.indexOf("--plans") match {
      case i if i >= 0 =>
        require(i + 1 < rest.length,
          "--plans requires an output directory operand")
        val out = rest(i + 1)
        rest = rest.patch(i, Nil, 2)
        Some(out)
      case _ => None
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val selected = if (rest.isEmpty) all
      else all.filter { case (n, _) => rest.contains(n) }
    require(selected.nonEmpty, s"no queries matched ${rest.mkString(",")}")

    val spark = session(cpus)
    plansOut.foreach { out =>
      val d = new java.io.File(out)
      d.mkdirs()
      selected.foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$out/$name.txt"), plan)
          println(s"[bench-extra] wrote plan $out/$name.txt")
        } catch {
          case e: Throwable =>
            println(s"[bench-extra] plan $name FAILED: ${e.getMessage}")
        }
      }
    }

    // warm pass (whole-JVM JIT/codegen lands here, as in Bench)
    selected.foreach { case (_, fn) =>
      try { fn(spark, dir).count() } catch { case _: Throwable => () }
    }
    def timedPass(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val p1 = timedPass()
    val p2 = timedPass()
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    results.foreach { case (n, t) => println(f"[bench-extra] $n $t%.3f s") }
    println(f"[bench-extra] total ${results.map(_._2).sum}%.3f s " +
      s"(${results.size} queries, $dir)")
    spark.stop()
  }
}
