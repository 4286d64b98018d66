package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training/apply cost probe — the evidence behind the r08
  * BpeTrain rework (local incremental trainer vs the per-round Spark
  * loop; gated encode vs the linear reference). Tooling main.
  *
  * Usage: sbt "runMain graft.jobs.BpeProbe [sfDir] [merges]"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
    val wf = graft.ops.BpeTrain.wordFrequencies(docs, "text")
      .localCheckpoint()
    println(s"[bpe] vocab=${wf.count()} distinct words, target $nMerges merges")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bpe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // the corpus vocabulary is tiny (31 words), so synthesize a larger
    // Zipf-ish vocabulary for a meaningful trainer measurement
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val synth = (0 until 20000).map { i =>
      val len = 2 + rnd.nextInt(10)
      ((0 until len).map(_ => ('a' + rnd.nextInt(12)).toChar).mkString,
        (20000L / (i + 1) + 1))
    }.distinct.toDF("word", "freq").localCheckpoint()
    println(s"[bpe] synth vocab=${synth.count()}")

    val local = timed(s"local train x$nMerges") {
      graft.ops.BpeTrain.trainMerges(synth, nMerges)
    }
    // the distributed loop at one job per merge is too slow to run at
    // the full count — time a 1/20 slice and extrapolate linearly
    // (per-round cost is flat: same frame, one argmax job per round)
    val distSlice = math.max(1, nMerges / 20)
    val dist = timed(s"spark-loop train x$distSlice") {
      graft.ops.BpeTrain.trainMerges(synth, distSlice, localBudgetBytes = 0L)
    }
    require(local.take(dist.length) == dist,
      "local and spark-loop merge lists diverge")
    println(s"[bpe] merge lists agree on the first ${dist.length} merges")

    val words = docs
      .select(explode(filter(split(col("text"), " "), t => length(t) > 0))
        .as("word"))
    val sample = words.limit(200000).as[String].collect()
    timed("gated encode 200k words") {
      var s = 0L
      sample.foreach(w => s += graft.ops.BpeTrain.encodeWord(w, local).length)
      s
    }
    timed("linear encode 200k words") {
      var s = 0L
      sample.foreach(w =>
        s += graft.ops.BpeTrain.encodeWordReference(w, local).length)
      s
    }
    spark.stop()
  }
}
