package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`vec_id: long, embedding: array<float>`).
  *
  *  - `bruteCosineTopK` — exact baseline: broadcast the (small) query set,
  *    one narrow pass over the corpus, per-query top-k via window. Dot
  *    products stay in codegen (`zip_with` + `aggregate` built-ins, no UDF).
  *  - `lshCosineTopK` — scale path: random-hyperplane (sign) LSH buckets;
  *    exact cosine only within a bucket. Hyperplanes are seeded Rademacher
  *    vectors (deterministic), so bucketing is reproducible cluster-wide.
  */
object Similarity {

  /** cosine(a, b) as a codegen'd Column (no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast). Self-matches excluded. */
  def bruteCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val joined = corpus
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("query_emb"), col("embedding")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank"))
  }

  /** Deterministic random-hyperplane sign signature (8 bits — tuned so
    * sandbox-scale buckets stay populated; raise for larger corpora). */
  val SignBits = 8

  private val lshUdf = udf((emb: Seq[Float]) => SimilarityKernel.signBucket(emb))

  /** Bucket each vector by its sign signature (narrow). */
  def lshBuckets(corpus: DataFrame): DataFrame =
    corpus.withColumn("bucket", lshUdf(col("embedding")))

  /** ANN top-k: candidates share the LSH bucket; exact cosine inside.
    * Recall < 1 by construction (scale path; the baseline above is the
    * correctness reference). */
  def lshCosineTopK(corpus: DataFrame, k: Int): DataFrame = {
    val b = lshBuckets(corpus)
    val left = b.select(col("bucket"), col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val right = b.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("neighbor_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    left.join(right, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("query_emb"), col("neighbor_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup by similarity ≥ t):
    * LSH-bucketed so only same-bucket pairs are compared. */
  def cosineNearDups(corpus: DataFrame, threshold: Double): DataFrame = {
    val b = lshBuckets(corpus)
    val left = b.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("emb_a"))
    val right = b.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("emb_b"))
    left.join(right, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}

object SimilarityKernel {
  /** Sign-LSH bucket: bit j = sign(dot(v, h_j)), h_j a seeded Rademacher
    * (±1) hyperplane — h_j[d] from a mixed hash of (j, d). */
  def signBucket(emb: Seq[Float]): Int = {
    if (emb == null || emb.isEmpty) return 0
    var bucket = 0
    var j = 0
    while (j < Similarity.SignBits) {
      var dot = 0.0
      var d = 0
      while (d < emb.length) {
        var h = (j * 0x9e3779b9L + d * 0x85ebca6bL + 0xc2b2ae35L)
        h ^= h >>> 16; h *= 0x45d9f3bL; h ^= h >>> 16
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        dot += sign * emb(d)
        d += 1
      }
      if (dot >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }
}
