package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index over an embedding column — the
  * coarse-quantize-then-search scale path (complements the sign-LSH
  * variant in [[Similarity]]):
  *
  *  1. train: deterministic seeds (lowest vec_ids) → one Lloyd iteration;
  *     per-cell centroids computed with a custom typed
  *     [[org.apache.spark.sql.expressions.Aggregator]] (mean of vectors —
  *     map-side combinable, one shuffle of k small buffers).
  *  2. assign: narrow pass, nearest-centroid cell id per vector
  *     (centroids broadcast via closure — k×dim floats).
  *  3. search: candidates share the query's cell (nprobe=1); exact cosine
  *     inside the cell only.
  */
object IvfIndex {

  /** Mean-of-vectors buffer (sum + count). */
  final case class VecMeanBuf(sum: Array[Double], n: Long)

  /** Typed Aggregator: mean embedding per group. Demonstrates the custom
    * aggregate surface (Aggregator[IN, BUF, OUT]) — partial aggregation
    * (merge) keeps the shuffle at one buffer per cell per partition. */
  class VecMean(dim: Int) extends Aggregator[Seq[Float], VecMeanBuf, Seq[Float]] {
    def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)
    def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf = {
      var i = 0
      val s = b.sum
      while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
      VecMeanBuf(s, b.n + 1)
    }
    def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
      var i = 0
      val s = a.sum
      while (i < dim) { s(i) += b.sum(i); i += 1 }
      VecMeanBuf(s, a.n + b.n)
    }
    def finish(b: VecMeanBuf): Seq[Float] =
      if (b.n == 0) Seq.fill(dim)(0.0f)
      else b.sum.map(x => (x / b.n).toFloat).toSeq
    def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
    def outputEncoder: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
  }

  private def cosineDist(a: Seq[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  def nearestCell(centroids: Array[Array[Float]], v: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = cosineDist(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** One-pass training: deterministic seeds (k lowest vec_ids) → assign →
    * per-cell mean via the typed Aggregator → centroids. */
  def train(corpus: DataFrame, k: Int): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds: Array[Array[Float]] = corpus
      .orderBy(col("vec_id").asc).limit(k)
      .select(col("embedding")).as[Seq[Float]]
      .collect().map(_.toArray)
    if (seeds.isEmpty) return Array.empty
    val dim = seeds(0).length

    val assignUdf = udf((v: Seq[Float]) => nearestCell(seeds, v))
    val meanAgg = new VecMean(dim).toColumn

    corpus
      .withColumn("cell", assignUdf(col("embedding")))
      .groupByKey(r => r.getAs[Int]("cell"))(Encoders.scalaInt)
      .mapValues(r => r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      .agg(meanAgg.name("centroid"))
      .collect()
      .sortBy(_._1)
      .map(_._2.toArray)
  }

  /** Cell assignment (narrow). */
  def assign(corpus: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val assignUdf = udf((v: Seq[Float]) => nearestCell(centroids, v))
    corpus.withColumn("cell", assignUdf(col("embedding")))
  }

  /** IVF top-k: candidates share the cell; exact cosine inside. */
  def topK(corpus: DataFrame, centroids: Array[Array[Float]], k: Int): DataFrame = {
    val assigned = assign(corpus, centroids)
    val left = assigned.select(col("cell"), col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val right = assigned.select(col("cell"), col("vec_id").as("neighbor_id"),
      col("embedding").as("neighbor_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    left.join(right, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosine(col("query_emb"), col("neighbor_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
