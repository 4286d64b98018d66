package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic data-mixture sampling — the "domain reweighting" stage
  * every LLM training pipeline runs between curation and tokenization
  * (The Pile's per-subset epoch counts, DoReMi's tuned domain weights):
  * given a per-domain target rate, emit each document `floor(rate)`
  * times plus one more copy with probability `frac(rate)`, so the
  * expected token share of every domain matches the requested mixture.
  * Rates below 1 downsample, rates above 1 upsample (multiple epochs of
  * a small high-quality domain), rate 0 drops the domain.
  *
  * Everything is DETERMINISTIC — no RNG state, no seed files. The
  * keep-the-extra-copy decision for a document is a pure function of its
  * id (a Lehmer LCG in exact 64-bit-safe integer arithmetic), and the
  * training-order shuffle key is a pure function of (id, copy). Reruns,
  * retries, and speculative attempts all produce byte-identical output,
  * and any SQL engine can replay the whole stage — the DuckDB oracle
  * recomputes every copy count and shuffle key from scratch.
  *
  * Scale shape (the 100 TB contract):
  *  - the weights table is one row per domain — a broadcast join;
  *  - copy-count + explode is a per-row expression: ZERO wide shuffles
  *    from scan to sampled output (the plan stays in one map stage);
  *  - the global training-order shuffle is ONE `repartitionByRange` on
  *    the LCG key ([[orderForTraining]]) — balanced by construction
  *    because the key is uniform on [0, 2^31-1), no skew possible.
  */
object Mixing {

  /** Modulus of the Lehmer generator: the Mersenne prime 2^31 - 1. */
  val LcgMod = 2147483647L

  /** Lehmer multiplier (MINSTD). `x * 48271` stays far inside the
    * 64-bit range for any x < 2^31, so the arithmetic is exact (and
    * identical) in every ANSI SQL engine. */
  val LcgMul = 48271L

  /** Deterministic uniform in [0, LcgMod): one Lehmer step of
    * `(x % m + salt + 1)`. The `+ 1` keeps id 0 off the fixed point;
    * the salt is reduced driver-side so the sum never overflows. */
  def lcg(x: Column, salt: Long): Column = {
    val saltR = ((salt % LcgMod) + LcgMod + 1L) % LcgMod
    (((pmod(x, lit(LcgMod)) + lit(saltR)) % LcgMod) * LcgMul) % LcgMod
  }

  /** Deterministic uniform in [0, 1_000_000) for the fractional-copy
    * test — the e6-scaled analog of `rand() < frac(rate)`. */
  def uE6(id: Column, salt: Long): Column = lcg(id, salt) % 1000000L

  /** Per-(id, copy) training-order key in [0, LcgMod): a second Lehmer
    * step over a copy-salted id, so the copies of one upsampled document
    * scatter across the whole training run instead of clumping. The id
    * is reduced mod 2^31-1 BEFORE the multiply, so the arithmetic stays
    * exact for any 64-bit id (max intermediate ≈ 5.7e18 < 2^63). */
  def shuffleKey(id: Column, copy: Column, salt: Long): Column =
    lcg(pmod(pmod(id, lit(LcgMod)) * 2654435761L + copy * 1299721L,
      lit(LcgMod)), salt)

  /** Number of copies of a row under an e6-scaled rate:
    * `rate DIV 1e6` guaranteed copies, plus one when the row's uniform
    * draw lands below `rate % 1e6`. True integer floor division
    * (Catalyst IntegralDivide, the SQL `DIV`): the earlier
    * double-`/`-then-cast could diverge from the documented exact-long
    * contract for weight_e6 beyond 2^53. */
  def copiesFor(id: Column, weightE6: Column, salt: Long): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(weightE6),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          lit(1000000L)))) +
      when(uE6(id, salt) < weightE6 % 1000000L, 1L).otherwise(0L)

  /** Sample a mixture: `weights` is (domainCol, weight_e6) — one row per
    * domain, weight_e6 = target rate × 1e6 (2_500_000 = 2.5 epochs,
    * 250_000 = keep a quarter, 0 = drop). Output keeps the input columns
    * and adds `n_copies` (how many copies this row got), `copy`
    * (0-based copy index) and `shuffle_key` (training-order key) — one
    * output row per copy. Domains missing from `weights` default to
    * rate 0 (dropped), matching the explicit-mixture discipline. */
  def sampleMixture(docs: DataFrame, domainCol: String, idCol: String,
      weights: DataFrame, salt: Long = 0L): DataFrame = {
    val id = col(idCol)
    docs
      .join(broadcast(weights), Seq(domainCol), "left")
      .withColumn("n_copies",
        copiesFor(id, coalesce(col("weight_e6"), lit(0L)), salt))
      .drop("weight_e6")
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
      .withColumn("shuffle_key", shuffleKey(id, col("copy"), salt))
  }

  /** Achieved-vs-target accounting: per domain, the input rows, the
    * sampled rows, and the achieved e6 rate (`sampled * 1e6 DIV input`).
    * The mixture gate a pipeline asserts before spending GPU time. */
  def mixtureStats(docs: DataFrame, sampled: DataFrame,
      domainCol: String): DataFrame = {
    val in = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("rows_in"))
    val out = sampled.groupBy(col(domainCol))
      .agg(count(lit(1)).as("rows_sampled"))
    in.join(out, Seq(domainCol), "left")
      .withColumn("rows_sampled", coalesce(col("rows_sampled"), lit(0L)))
      .withColumn("achieved_e6",
        expr("rows_sampled * 1000000 DIV rows_in"))
  }

  /** Deterministic train/val/test assignment: `splits` is an ordered
    * list of (name, fraction_e6) summing to exactly 1e6; a row lands in
    * the first split whose cumulative fraction exceeds its uniform
    * draw. Pure function of (id, salt): rerunning, re-reading, or
    * re-sharding the corpus can never move a document across splits —
    * the leakage-proof property hash-splitting exists for. The draw is
    * id-uniform, so expected proportions hold within every domain
    * (stratification for free at corpus scale). Adds `split`. */
  def assignSplits(docs: DataFrame, idCol: String,
      splits: Seq[(String, Long)], salt: Long = 7L): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0), "split fractions must be >= 0")
    require(splits.map(_._2).sum == 1000000L,
      s"split fractions (e6) must sum to 1000000 " +
        s"(got ${splits.map(_._2).sum})")
    val u = uE6(col(idCol), salt)
    val cum = splits.scanLeft(0L)(_ + _._2).tail
    // u < 1e6 always, so the last branch is total
    val assigned = splits.zip(cum).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), bound)) =>
        coalesce(acc, when(u < bound, name))
    }
    docs.withColumn("split", assigned)
  }

  /** Derive per-domain rates from a TOKEN budget: `domainTokens` is
    * (domainCol, tokens), `propsE6` is (domainCol, prop_e6) — the target
    * share of the budget, e6-scaled. The rate that makes domain d's
    * expected token draw equal `budget * prop_d` is
    * `budget * prop_d / tokens_d`; e6-scaled and floored:
    * `weight_e6 = budget * prop_e6 DIV tokens`. Exact long arithmetic
    * bounds the budget at ~9.2e12 tokens (9 trillion — above any
    * published training run; the guard fails loudly, never wraps).
    * Output: (domainCol, tokens, weight_e6) — feed straight into
    * [[sampleMixture]]. Domains with a prop but no tokens are dropped
    * (nothing to sample); domains with tokens but no prop get rate 0. */
  def ratesForBudget(domainTokens: DataFrame, propsE6: DataFrame,
      domainCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0 (got $budgetTokens)")
    require(budgetTokens <= 9000000000000L,
      s"budget $budgetTokens exceeds the exact-arithmetic bound 9e12")
    domainTokens
      .join(broadcast(propsE6), Seq(domainCol), "left")
      .filter(col("tokens") > 0)
      .select(col(domainCol), col("tokens"),
        expr(s"$budgetTokens * coalesce(prop_e6, 0) DIV tokens")
          .as("weight_e6"))
  }

  /** Globally shuffle sampled rows into training order: ONE range
    * repartition on the uniform shuffle key, then a per-partition-local
    * sort — the standard "global shuffle before sharding" step. Output
    * partition files read in order give the deterministic training
    * sequence. `idCol` breaks shuffle-key collisions (the key is only
    * 31 bits — two documents CAN collide, and without a total order the
    * colliding pair's relative position would depend on input
    * partitioning). */
  def orderForTraining(sampled: DataFrame, partitions: Int,
      idCol: String): DataFrame = {
    require(partitions > 0, s"partitions must be positive (got $partitions)")
    sampled
      .repartitionByRange(partitions, col("shuffle_key"), col(idCol),
        col("copy"))
      .sortWithinPartitions(col("shuffle_key"), col(idCol), col("copy"))
  }
}
