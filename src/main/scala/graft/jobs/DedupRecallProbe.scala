package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-recall diagnostic for the x_dedup_recall gate design: on the
  * driver's documents table (doc_id % 10 sample), measure the recall of
  * minhashNearDups(0.5) pairs against the exact shingle-Jaccard pair
  * set at several twin thresholds, and the banded simhash(≤3) pair set
  * against the exact quadratic hamming pass. */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // exact-dedup survivors: minhashNearDups collapses byte-identical
    // texts first and reports pairs between representatives — the twin
    // must live in the same space
    // arg 2: "%N" → doc_id % N == 0 sample; plain N → doc_id < N prefix
    val sel = if (args.length > 1) args(1) else "%10"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val filtered =
      if (sel.startsWith("%")) base.filter(col("doc_id") % sel.tail.toInt === 0)
      else base.filter(col("doc_id") < sel.toInt)
    val sample = graft.ops.Dedup.exactSurvivors(filtered)
    sample.cache()
    println(s"[dr] sample survivor docs = ${sample.count()}")

    // exact all-pairs shingle Jaccard on the sample (quadratic twin)
    val rows = sample.as[(Long, String)].collect()
    val sh = rows.map { case (id, t) =>
      id -> graft.ops.MinHashKernel.shingleHashes(t, 3).toSet }
    val exact = for {
      i <- sh.indices; j <- (i + 1) until sh.length
      (a, sa) = sh(i); (b, sb) = sh(j)
      if sa.nonEmpty || sb.nonEmpty
      inter = sa.intersect(sb).size
      uni = sa.size + sb.size - inter
      if uni > 0
    } yield (math.min(a, b), math.max(a, b), inter.toDouble / uni)

    val found = graft.ops.Dedup.minhashNearDups(sample, threshold = 0.5)
      .select(col("a"), col("b")).as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

    for (t <- Seq(0.5, 0.6, 0.7, 0.8)) {
      val twin = exact.filter(_._3 >= t).map(p => (p._1, p._2)).toSet
      val hit = twin.count(found.contains)
      println(f"[dr] minhash(0.5) vs exact>=$t%.1f : twin=${twin.size}%4d " +
        f"hit=$hit recall=${if (twin.isEmpty) 1.0 else hit.toDouble / twin.size}%.4f")
    }

    // simhash: banded (≤3) vs exact quadratic hamming over the sample
    val sketches = sample
      .select(col("doc_id"),
        graft.sql.GraftFunctions.graft_simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect()
    val exactSim = (for {
      i <- sketches.indices; j <- (i + 1) until sketches.length
      if java.lang.Long.bitCount(sketches(i)._2 ^ sketches(j)._2) <= 3
    } yield (math.min(sketches(i)._1, sketches(j)._1),
      math.max(sketches(i)._1, sketches(j)._1))).toSet
    val foundSim = graft.ops.Dedup.simhashNearDups(sample, maxDistance = 3)
      .select(col("a"), col("b")).as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    println(s"[dr] simhash<=3 banded=${foundSim.size} exact=${exactSim.size} " +
      s"equal=${foundSim == exactSim}")
    spark.stop()
  }
}
