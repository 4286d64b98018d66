package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall vs parameters on the driver's embeddings table — tuning
  * diagnostic (which nprobe / table count the data structure needs). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val brute = graft.ops.Similarity.bruteCosineTopK(emb, emb, 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
      val per = brute.map { case (q, e) =>
        got.getOrElse(q, Set.empty[Long]).intersect(e).size.toDouble / e.size }
      per.sum / per.size
    }

    // same-label top-5 share (how much locality the data actually has)
    val n = emb.count()
    println(s"[recall] n=$n")

    val centroids = graft.ops.IvfIndex.train(emb)
    for (np <- Seq(2, 4, 8, 12, 16)) {
      val r = recallOf(graft.ops.IvfIndex.topK(emb, centroids, 5, nprobe = np))
      println(f"[recall] ivf nprobe=$np%-3d recall=$r%.3f")
    }
    println(f"[recall] lsh auto-default recall=${recallOf(
      graft.ops.Similarity.lshCosineTopK(emb, 5))}%.3f")
    for ((bits, tables) <- Seq((8, 12), (5, 24), (5, 32), (4, 24))) {
      val r = recallOf(graft.ops.Similarity.lshCosineTopK(emb, 5,
        signBits = bits, tables = tables))
      println(f"[recall] lsh bits=$bits tables=$tables%-3d recall=$r%.3f")
    }
    spark.stop()
  }
}
