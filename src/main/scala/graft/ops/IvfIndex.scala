package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index over an embedding column — the
  * coarse-quantize-then-search scale path (complements the sign-LSH
  * variant in [[Similarity]]):
  *
  *  1. train: deterministic seeds (lowest vec_ids) → `DefaultIters` Lloyd
  *     iterations; per-cell centroids computed with a custom typed
  *     [[org.apache.spark.sql.expressions.Aggregator]] (mean of vectors —
  *     map-side combinable, one shuffle of k small buffers per iteration).
  *  2. assign: narrow pass, nearest-centroid cell id per vector
  *     (centroids broadcast via closure — k×dim floats).
  *  3. search: each query probes its `nprobe` nearest cells; exact cosine
  *     against cell members only.
  *
  * Scale parameters (sandbox constants were the round-1 weakness):
  *  - k defaults to ⌈√n⌉ (capped at `MaxCells` so the collected centroid
  *    set stays driver-sized) → expected cell ≈ √n, so per-query work is
  *    O(nprobe·√n) instead of O(n/16).
  *  - `cellCap` bounds the candidates taken from any one cell (hot-cell
  *    skew: at 100 TB a popular embedding region would otherwise make one
  *    cell quadratic). Capped cells keep a deterministic hash-ordered
  *    sample; `cellDrops` reports what the cap discarded — log it, never
  *    let silent truncation read as full coverage.
  */
object IvfIndex {

  val DefaultIters = 2

  /** Recall-first probe default. On corpora with cluster structure a
    * handful of probes reaches ≥0.9 recall; on near-orthogonal embeddings
    * (the hardest case — cell assignment is nearly random) recall ≈
    * covered-cell fraction, so the shipped default must probe generously:
    * nprobe 16 × replicas 3 measured ≥0.95 top-5 recall on the driver's
    * near-orthogonal table, vs 0.384 at the round-2 default (np4, r1). */
  val DefaultNProbe = 16

  /** Multi-assignment replication: each corpus vector is indexed under
    * its `DefaultReplicas` nearest cells (FLANN-style multiple
    * assignment). A true neighbor is missed only when NONE of its
    * replicas land in a probed cell — with r replicas and p probed of c
    * cells the miss probability falls ~((c−p)/c)^r instead of (c−p)/c.
    * Costs r× index rows (storage + candidate work), the price of a
    * recall floor that holds even without cluster structure. */
  val DefaultReplicas = 3

  val MaxCells = 65536
  val DefaultCellCap = 10000

  /** Below this corpus size brute force beats IVF at its recall-first
    * operating point AND is exact: per-query IVF candidate work is
    * ≈ nprobe × replicas × (n / √n) = 48·√n cosines plus Lloyd training
    * and three extra shuffles, so the probed fraction
    * nprobe·replicas/√n only falls under ~25% beyond n ≈ 32k — measured
    * at sf0.1 (n = 2000) brute is 0.4 s vs 10.3 s for the IVF path.
    * [[topKAuto]] routes on this; explicit-centroid [[topK]] never
    * routes (it IS the forced approximate path, e.g. for recall
    * measurement). */
  val BruteCrossover = 32768L

  /** Sub-cells a single hot coarse cell may be split into (two-level
    * quantization); bounds the per-cell driver state. */
  val MaxSubCells = 4096

  /** Sub-cells probed inside each probed HOT cell. Sized with the 4×
    * oversplit so the candidate mass per probed hot cell stays
    * ≈ cellCap (subProbe × expected sub-cell load of cellCap/4). */
  val DefaultSubProbe = 4

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

  // primitive-array kernels: a Seq[Float] parameter boxes every element
  // access through the generic apply — callers convert ONCE per row
  private def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  def nearestCell(centroids: Array[Array[Float]], v: Seq[Float]): Int =
    nearestCellArr(centroids, toFloatArray(v))

  def nearestCellArr(centroids: Array[Array[Float]], v: Array[Float]): Int = {
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

  private def toFloatArray(v: Seq[Float]): Array[Float] = v match {
    case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
    case other =>
      val out = new Array[Float](other.length)
      var i = 0
      val it = other.iterator
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
  }

  /** The `nprobe` nearest cells for a query vector (ascending distance,
    * deterministic tie-break on cell id). */
  def nearestCells(centroids: Array[Array[Float]], v: Seq[Float],
      nprobe: Int): Array[Int] = {
    val arr = toFloatArray(v)
    val dists = Array.tabulate(centroids.length)(c =>
      (cosineDist(arr, centroids(c)), c))
    dists.sortBy(identity).take(math.min(nprobe, centroids.length)).map(_._2)
  }

  /** ⌈√n⌉ cells, driver-capped. */
  def cellsFor(n: Long): Int =
    math.min(MaxCells, math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Training-sample multiplier: Lloyd iterations run on a deterministic
    * hash-sample of ≈`TrainPointsPerCell × k` vectors, not the full
    * corpus — at 10^12 rows a full-corpus k-means pass per iteration is
    * the wrong shape (coarse-quantizer practice is to train on a bounded
    * sample; 50+ points per cell is ample for 2 refinement rounds).
    * Corpora at or below the cap train on everything (no behavior change
    * at oracle/bench scale). */
  val TrainPointsPerCell = 64

  /** Lloyd training: deterministic seeds (k lowest vec_ids), then `iters`
    * assign→mean rounds over a hash-bounded training sample. k ≤ 0 →
    * ⌈√n⌉. Cells that lose all members keep their previous centroid
    * (stable ids, no collapse). */
  def train(corpus: DataFrame, k: Int = -1,
      iters: Int = DefaultIters, knownN: Long = -1L): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = if (knownN >= 0L) knownN else corpus.count()
    val kk = if (k > 0) k else cellsFor(n)
    val sampleTarget = TrainPointsPerCell.toLong * kk
    val trainSet =
      if (n <= sampleTarget) corpus
      else {
        // deterministic hash-sample: keep ≈ sampleTarget vectors
        val modulus = math.max(1L, n / sampleTarget)
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(modulus)) === 0L)
      }
    var centroids: Array[Array[Float]] = trainSet
      .orderBy(col("vec_id").asc).limit(kk)
      .select(col("embedding")).as[Seq[Float]]
      .collect().map(_.toArray)
    if (centroids.isEmpty) return Array.empty
    val dim = centroids(0).length

    var it = 0
    while (it < iters) {
      val cents = centroids // stable reference for the closure
      val assignUdf = udf((v: Seq[Float]) => nearestCell(cents, v))
      val meanAgg = new VecMean(dim).toColumn
      val means: Map[Int, Array[Float]] = trainSet
        .withColumn("cell", assignUdf(col("embedding")))
        .groupByKey(r => r.getAs[Int]("cell"))(Encoders.scalaInt)
        .mapValues(r => r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)(
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        .agg(meanAgg.name("centroid"))
        .collect()
        .map { case (cell, c) => cell -> c.toArray }
        .toMap
      centroids = Array.tabulate(centroids.length)(c =>
        means.getOrElse(c, centroids(c)))
      it += 1
    }
    centroids
  }

  /** Cell assignment (narrow, primary cell only — kept for statistics
    * and clustering callers like ActiveLearning). Centroids ship as a
    * broadcast variable, not a task-closure capture: at MaxCells ×
    * dim 768 the closure would serialize ~200 MB PER TASK; a broadcast
    * ships once per executor (torrent blocks) and is shared. */
  def assign(corpus: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearestCell(bc.value, v))
    corpus.withColumn("cell", assignUdf(col("embedding")))
  }

  /** Multi-assignment: one row per (vector, replica cell). */
  private def assignMulti(corpus: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
      replicas: Int): DataFrame = {
    val assignUdf = udf((v: Seq[Float]) => nearestCells(bc.value, v, replicas))
    corpus.select(col("vec_id"), col("embedding"),
      explode(assignUdf(col("embedding"))).as("cell"))
  }

  /** Two-level sub-quantizer for hot cells: coarse cells whose (replicated)
    * member count exceeds `cellCap` get ⌈count/cellCap⌉ sub-centroids
    * (deterministic hash-ordered member seeds — cheap, data-adaptive), so
    * members are SPLIT across bounded sub-cells instead of dropped.
    * Driver state is Σ⌈count/cellCap⌉ vectors, ≤ MaxSubCells per cell
    * (the collect below pulls exactly the chosen SEEDS, one window pass,
    * rn ≤ kSub(cell) — never a cell's full membership); callers ship the
    * result as a broadcast variable. Hot cells are selected by a
    * broadcast join on a tiny cell-id table — an `isin` with thousands
    * of hot cells would build a giant In-list expression per task. */
  private[ops] def trainSubCells(assigned: DataFrame,
      cellCap: Int): Map[Int, Array[Array[Float]]] = {
    val counts = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hot = counts.filter(_._2 > cellCap)
    if (hot.isEmpty) return Map.empty
    val spark = assigned.sparkSession
    import spark.implicits._
    // 4× oversplit: expected sub-cell load ≈ cellCap/4. Nearest-seed
    // sub-assignment inside a DEGENERATE hot cell (near-identical
    // members — the very thing that makes a cell hot) is strongly
    // skewed: a many-hot-cells stress test measured ~2.5× max/mean at
    // 2× oversplit (9% residual drops); 4× headroom absorbs it.
    val kSub: Map[Int, Int] = hot.map { case (c, n) =>
      c -> math.min(MaxSubCells.toLong, 4L * ((n + cellCap - 1) / cellCap)).toInt
    }
    val hotDf = broadcast(
      kSub.toSeq.map { case (c, k) => (c, k) }.toDF("cell", "k_sub"))
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    assigned
      .join(hotDf, Seq("cell"))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= col("k_sub")) // per-cell seed count, not max
      .select(col("cell"), col("rn"), col("embedding"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1))
          .map(r => toFloatArray(r.getAs[scala.collection.Seq[Float]](2).toSeq))
      }
  }

  /** Composite (coarse cell, sub cell) candidate key. */
  @inline private def ckeyOf(cell: Int, sub: Int): Long =
    (cell.toLong << 20) | sub.toLong

  /** Candidate index rows keyed by (coarse, sub) cell — pre-cap. */
  private def keyedCandidates(assigned: DataFrame,
      bcSub: org.apache.spark.broadcast.Broadcast[
        Map[Int, Array[Array[Float]]]]): DataFrame = {
    val fineUdf = udf((cell: Int, v: Seq[Float]) =>
      bcSub.value.get(cell) match {
        case Some(sc) => ckeyOf(cell, nearestCell(sc, v))
        case None => ckeyOf(cell, 0)
      })
    assigned.withColumn("ckey", fineUdf(col("cell"), col("embedding")))
  }

  /** Candidate rows dropped by `cellCap` AFTER two-level splitting —
    * hot-cell accounting for the bench (0 unless a cell outgrows
    * cellCap × MaxSubCells). */
  def cellDrops(corpus: DataFrame, centroids: Array[Array[Float]],
      cellCap: Int = DefaultCellCap,
      replicas: Int = DefaultReplicas): Long = {
    val sc = corpus.sparkSession.sparkContext
    val assigned = assignMulti(corpus, sc.broadcast(centroids), replicas)
    val subCents = sc.broadcast(trainSubCells(assigned, cellCap))
    keyedCandidates(assigned, subCents)
      .groupBy(col("ckey")).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(greatest(col("n") - cellCap, lit(0L))), lit(0L)))
      .collect()(0).getLong(0)
  }

  /** IVF top-k: each query probes its `nprobe` nearest coarse cells (and
    * the `subProbe` nearest sub-cells inside each probed hot cell); exact
    * cosine against cap-bounded cell members. Corpus vectors are indexed
    * under `replicas` cells (see [[DefaultReplicas]]); duplicate
    * (query, neighbor) sightings are deduped before ranking. */
  def topK(corpus: DataFrame, centroids: Array[Array[Float]], k: Int,
      nprobe: Int = DefaultNProbe,
      cellCap: Int = DefaultCellCap,
      replicas: Int = DefaultReplicas,
      subProbe: Int = DefaultSubProbe,
      queries: DataFrame = null,
      knownN: Long = -1L,
      broadcastBudget: Long = Similarity.DefaultBroadcastBudgetBytes)
      : DataFrame = {
    val sc = corpus.sparkSession.sparkContext
    // query-set search: probe fan-out, candidate join and ranking window
    // all scale with |queries| instead of n (queries default = corpus)
    val qsrc = if (queries == null) corpus else queries
    val bcCents = sc.broadcast(centroids)
    val assigned = assignMulti(corpus, bcCents, replicas)
    val bcSub = sc.broadcast(trainSubCells(assigned, cellCap))
    // residual-cap safety net (a cell beyond cellCap × MaxSubCells):
    // deterministic hash-ordered sample per sub-cell, drops accounted
    // via cellDrops
    val wKey = Window.partitionBy(col("ckey"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    // ids only past this point: the probe fan-out (×replicas index rows,
    // ×nprobe·subProbe query rows) and the candidate join must not carry
    // the vectors — pairs are deduped as two longs and the embeddings
    // join back once per side (Catalyst picks broadcast vs shuffled hash
    // join by corpus size)
    val candidates = keyedCandidates(assigned, bcSub)
      .select(col("ckey"), col("vec_id")) // drop embeddings BEFORE the
      // cap window: its sort shuffle must move (key, id) pairs, not
      // dim-sized arrays per replicated row
      .withColumn("rn", row_number().over(wKey))
      .filter(col("rn") <= cellCap)
      .select(col("ckey"), col("vec_id").as("neighbor_id"))
    val probeUdf = udf((v: Seq[Float]) => {
      val coarse = nearestCells(bcCents.value, v, nprobe)
      val out = Array.newBuilder[Long]
      var i = 0
      while (i < coarse.length) {
        val c = coarse(i)
        bcSub.value.get(c) match {
          case Some(sc) =>
            val subs = nearestCells(sc, v, subProbe)
            var j = 0
            while (j < subs.length) { out += ckeyOf(c, subs(j)); j += 1 }
          case None => out += ckeyOf(c, 0)
        }
        i += 1
      }
      out.result()
    })
    val probes = qsrc
      .select(col("vec_id").as("query_id"),
        explode(probeUdf(col("embedding"))).as("ckey"))
    val rawPairs = probes.join(candidates, Seq("ckey"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    // same ranking gate as Similarity.lshCosineTopK: a corpus the
    // caller KNOWS fits the broadcast budget scores pairs against a
    // broadcast id→vector block with partial top-k instead of two
    // join-backs materializing dim-sized arrays per candidate pair —
    // and the kernel dedups the ×replicas/probes sightings itself
    // (buffer-scan + over partials), skipping the full-pair exchange.
    // Row-count pre-filter keeps the embDim head-probe off corpora
    // whose row count alone exceeds the budget.
    if (knownN >= 0L && knownN * 4L <= broadcastBudget && knownN *
        math.max(Similarity.embDim(corpus), 1).toLong * 4L <= broadcastBudget) {
      val nEmbF = corpus.select(col("vec_id"), col("embedding"))
      val qEmbF = if (queries == null) nEmbF
        else qsrc.select(col("vec_id"), col("embedding"))
      return Similarity.rankPairsTopKBroadcast(rawPairs, qEmbF, nEmbF, k,
        broadcastBudget)
    }
    val pairs =
      rawPairs.dropDuplicates("query_id", "neighbor_id") // ×sightings
    val embQ = qsrc.select(col("vec_id").as("query_id"),
      col("embedding").as("query_emb"))
    val embN = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("neighbor_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.join(embQ, Seq("query_id")).join(embN, Seq("neighbor_id"))
      .withColumn("cos", Similarity.cosineFast(col("query_emb"), col("neighbor_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Size-aware IVF top-k — the SHIPPED entry point: counts the corpus
    * once and routes to the exact brute-force baseline below
    * [[BruteCrossover]] (where brute is exact AND ~25× faster than the
    * recall-first IVF operating point), otherwise trains ⌈√n⌉ cells and
    * runs [[topK]]. Output schema is identical on both routes. Explicit
    * [[topK]]/[[train]] remain the forced approximate path (recall
    * measurement, pre-trained centroids). */
  def topKAuto(corpus: DataFrame, k: Int,
      nprobe: Int = DefaultNProbe,
      cellCap: Int = DefaultCellCap,
      replicas: Int = DefaultReplicas,
      subProbe: Int = DefaultSubProbe,
      knownN: Long = -1L,
      broadcastBudget: Long = Similarity.DefaultBroadcastBudgetBytes)
      : DataFrame = {
    val n = if (knownN >= 0L) knownN else corpus.count()
    // row crossover AND collected-byte budget (short-circuit keeps the
    // 1-row dim probe off the large-corpus path): wide vectors below
    // the row crossover but above the byte budget take the indexed path
    // instead of a driver-OOM-sized collect
    if (n < BruteCrossover && Similarity.routesToBrute(n,
        Similarity.embDim(corpus), BruteCrossover, broadcastBudget))
      Similarity.bruteCosineTopKSelf(corpus, k, broadcastBudget,
        preChecked = true)
    else topK(corpus, train(corpus, knownN = n), k, nprobe, cellCap,
      replicas, subProbe)
  }
}
