package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-curation sampling for an annotation/training loop (SURVEY §2.5
  * O11 — the analog of `HybridSampling.select_indices`,
  * /root/reference/ocr_service/modules/active_learning.py:50-96):
  * cluster the unlabeled pool for diversity, then take the most
  * UNCERTAIN rows from each cluster — mitigates sampling bias (all
  * picks from one region) and outlier flooding (all picks are weird).
  *
  * Two clusterings:
  *  - [[sampleByEmbedding]] — KMeans-style cells from [[IvfIndex]]
  *    centroids (the reference's KMeans, random_state→deterministic
  *    seeds). The real curation path.
  *  - [[sampleByQuantile]] — ntile clusters over a scalar feature.
  *    Fully relational (window functions only), so it has an exact SQL
  *    oracle; same select-per-cluster core.
  *
  * Both are window top-k per cluster: one shuffle on the cluster key,
  * rank state O(1) per partition — at 100 TB this is a single wide
  * stage, no driver materialization of the pool.
  */
object ActiveLearning {

  /** Per-cluster top-k by uncertainty (the core of HybridSampling:
    * active_learning.py:67-80). `perCluster` mirrors
    * `max(1, n_samples // n_clusters)` (line 67). Tie-break follows
    * numpy `argsort[::-1]` (stable ascending, reversed): uncertainty
    * DESC, then id DESC. */
  def selectPerCluster(features: DataFrame, idCol: String,
      uncertaintyCol: String, perCluster: Int): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(uncertaintyCol).desc, col(idCol).desc)
    features
      .withColumn("sel_rank", row_number().over(w))
      .filter(col("sel_rank") <= perCluster)
  }

  /** Embedding-clustered hybrid sampling. Input: (idCol, embCol,
    * uncertaintyCol). Output: selected rows with `cluster` and
    * `sel_rank`. */
  def sampleByEmbedding(pool: DataFrame, idCol: String, embCol: String,
      uncertaintyCol: String, nSamples: Int, nClusters: Int): DataFrame = {
    val forTrain = pool.select(col(idCol).as("vec_id"),
      col(embCol).as("embedding"))
    val k = math.max(1, math.min(nClusters, forTrain.count().toInt))
    val centroids = IvfIndex.train(forTrain, k)
    val assignUdf = udf((v: Seq[Float]) => IvfIndex.nearestCell(centroids, v))
    val clustered = pool.withColumn("cluster", assignUdf(col(embCol)))
    val perCluster = math.max(1, nSamples / k)
    selectPerCluster(clustered, idCol, uncertaintyCol, perCluster)
  }

  /** Quantile-clustered sampling: clusters = ntile(nClusters) over
    * (orderCol, idCol). Deterministic and SQL-expressible end-to-end —
    * the oracled twin of the embedding variant. */
  def sampleByQuantile(pool: DataFrame, idCol: String, orderCol: String,
      uncertaintyCol: String, nClusters: Int, perCluster: Int): DataFrame = {
    val wQ = Window.orderBy(col(orderCol).asc, col(idCol).asc)
    val clustered = pool.withColumn("cluster", ntile(nClusters).over(wQ))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(uncertaintyCol).desc, col(idCol).asc)
    clustered
      .withColumn("sel_rank", row_number().over(w))
      .filter(col("sel_rank") <= perCluster)
  }
}
