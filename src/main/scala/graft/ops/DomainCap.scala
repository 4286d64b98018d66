package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-domain document caps — the standard crawl-curation guard against
  * a single host dominating a training corpus (link farms, mirrors,
  * calendar pages). Keeps the top `k` documents per host under a
  * deterministic ranking.
  *
  * Skew is the whole problem here: a hot host can own double-digit
  * percentages of a crawl, so a naive `row_number over (partition by
  * host)` sends that host's entire mass to one reducer. `cap` runs two
  * phases: a SALTED window first prunes each (host, salt) slice to k
  * rows — provably a superset of the global top-k, because a row in the
  * global top-k is in the top-k of any subset containing it — then the
  * exact window ranks the ≤ k·salts survivors per host. The hot host
  * crosses the second exchange with ≤ k·salts rows instead of its full
  * population. */
object DomainCap {

  /** Lowercase host of a url ("" when unparseable — crawl data never
    * throws). Same URI semantics as UrlDedup.canonicalize. */
  def hostOf(url: String): String = {
    if (url == null || url.isEmpty) return ""
    try {
      val h = new java.net.URI(url.trim).getHost
      if (h == null) "" else h.toLowerCase
    } catch {
      case _: Exception => ""
    }
  }

  private val hostUdf = udf((u: String) => hostOf(u))

  /** Adds a `host` column (narrow). */
  def withHost(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("host", hostUdf(col(urlCol)))

  /** Keep at most `k` rows per host, ranked by `order` (deterministic —
    * include a unique tie-breaker). Input must already carry a `host`
    * column (see withHost). `saltOn` must be a plain row-deterministic
    * column (a unique id; NOT a sort expression) — it only spreads a hot
    * host's rows, never affects which rows survive. `salts` trades
    * residual skew (k·salts rows max per host at the final exchange)
    * against fan-out width. */
  def cap(df: DataFrame, k: Int, order: Seq[Column], saltOn: Column,
      salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, s"k=$k salts=$salts must be positive")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltOn), lit(salts)))
    val wSalt = Window.partitionBy(col("host"), col("_salt"))
      .orderBy(order: _*)
    val pruned = salted
      .withColumn("_rn", row_number().over(wSalt))
      .filter(col("_rn") <= k)
      .drop("_rn", "_salt")
    val wHost = Window.partitionBy(col("host")).orderBy(order: _*)
    pruned
      .withColumn("_rn", row_number().over(wHost))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Per-host population report alongside the cap — how many rows each
    * host lost. Map-side-combinable count, one shuffle. */
  def hostStats(df: DataFrame, k: Int): DataFrame =
    df.groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        greatest(count(lit(1)) - k, lit(0L)).as("n_dropped"))
}
