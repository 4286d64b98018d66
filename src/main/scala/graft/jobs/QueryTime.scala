package graft.jobs

import org.apache.spark.sql.SparkSession

/** One-off query timing (warm + timed) — iteration tool.
  * Usage: sbt "runMain graft.jobs.QueryTime <sfDir> <query> [query...]" */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warm
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[qt] $q ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
