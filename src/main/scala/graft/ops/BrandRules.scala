package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Card-brand reference data as a broadcast dimension join — the
  * file-based small-dimension pattern (SURVEY §2.3 T13 option): rules
  * mirror /root/reference/data/card_brand_rules.json:1-30 (brand,
  * accepted lengths, prefixes). One row per (brand, prefix, length)
  * after explode; the classify join broadcasts the ~100-row dimension,
  * so the fact side never shuffles — the correct shape at 10^12 rows.
  *
  * Match semantics: a number matches a rule when its length is accepted
  * and it starts with the rule's prefix; the LONGEST matching prefix
  * wins (tie → brand, then prefix, ascending — deterministic).
  */
object BrandRules {

  /** (brand, lengths, prefixes) — card_brand_rules.json verbatim. */
  val Rules: Seq[(String, Seq[Int], Seq[String])] = Seq(
    ("American Express", Seq(15), Seq("34", "37")),
    ("Diners Club - Carte Blanche", Seq(14),
      Seq("300", "301", "302", "303", "304", "305")),
    ("Diners Club - International", Seq(14), Seq("36", "38")),
    ("Diners Club - USA & Canada", Seq(16), Seq("54")),
    ("Discover", Seq(16),
      Seq("6011", "644", "645", "646", "647", "648", "649", "65")),
    ("enRoute", Seq(15), Seq("2014", "2149")),
    ("InstaPayment", Seq(16), Seq("637", "638", "639")),
    ("JCB Co Inc", Seq(15), Seq("1800", "2100")),
    ("JCB Co Inc", Seq(16),
      Seq("3088", "3096", "3112", "3158", "3337", "3528")),
    ("Laser", Seq(16, 17, 18, 19), Seq("6304", "6706", "6709", "6771")),
    ("MasterCard", Seq(16), Seq("51", "52", "53", "54", "55")),
    ("Visa", Seq(13, 16),
      Seq("4", "40240071", "4485", "4532", "4539", "4556", "4716", "4916",
        "4929")),
    ("Visa Electron", Seq(16),
      Seq("4026", "417500", "4508", "4844", "4913", "4917")),
    ("Voyager", Seq(15), Seq("8699")))

  /** Dimension table: one row per (brand, prefix, len). */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Rules.flatMap { case (brand, lengths, prefixes) =>
      for (l <- lengths; p <- prefixes) yield (brand, p, l)
    }.toDF("brand", "prefix", "len")
  }

  /** Brand per number via broadcast dimension join; unmatched →
    * "unknown". `idCol` must be a unique row key (the winner-pick window
    * partitions on it, so duplicate numbers on different rows are kept).
    * Input keeps all its columns. */
  def classify(numbers: DataFrame, numberCol: String,
      idCol: String): DataFrame = {
    val spark = numbers.sparkSession
    val rules = rulesDf(spark)
    val joined = numbers.join(
      broadcast(rules),
      length(col(numberCol)) === col("len") &&
        col(numberCol).startsWith(col("prefix")),
      "left")
    val w = Window.partitionBy(col(idCol))
      .orderBy(length(col("prefix")).desc, col("brand").asc,
        col("prefix").asc)
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "prefix", "len")
      .withColumn("brand", coalesce(col("brand"), lit("unknown")))
  }
}
