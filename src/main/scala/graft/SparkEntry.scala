package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.pipeline.ExtractPipeline
import graft.sql.GraftFunctions._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with a DuckDB-equivalent `oracleSql` for every
  * SQL-expressible operator. Kernel-level operators (HTML/PDF extraction,
  * MinHash/SimHash/ANN, multimodal) are non-SQL-expressible → rows-only
  * driver check; their correctness gate is the ScalaTest suite
  * (`sbt -batch test`) and the golden-determinism pipeline tests.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full extraction pipeline over the deterministic synthetic
    * pages corpus (FIXTURES.md) — driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = ExtractPipeline.pages(spark, 500, 8)
    ExtractPipeline.extract(pages, 8).toDF()
      .select("url", "text", "document_type", "type_confidence", "layout_type",
        "confidence", "status")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational operators over the oracle tables ------------------
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
          round(sum(col("l_extendedprice")) * 100).cast("long")
            .as("base_price_cents"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
            .cast("long").as("disc_price_cents"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q2_top_customers" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders
        .join(broadcast(customer),
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")) * 100).cast("long")
          .as("revenue_cents"),
          count(lit(1)).as("order_count"))
        .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
        .limit(10)
    }),

    "q3_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          col("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    "q4_event_counts" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")) * 100).cast("long").as("value_cents"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    "q5_event_windows" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("bucket",
          floor(unix_micros(col("ts").cast("timestamp")) / lit(300000000L)))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"), col("event_type"))
    }),

    "q6_dedup_first_event" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q7_best_doc_per_lang" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("doc_id").as("best_doc"),
          col("n_chars").as("best_chars"))
        .orderBy(col("lang"))
    }),

    "q14_top_words" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)
    }),

    "q15_user_set_ops" -> ((s, dir) => {
      // set-op semantics: purchasers INTERSECT signups, minus one-event
      // users (EXCEPT) — both operators exercised, non-empty result
      val ev = t(s, dir, "events")
      val purchasers = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id")).distinct()
      val singletons = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n")).filter(col("n") === 1)
        .select(col("user_id"))
      purchasers.intersect(signups).except(singletons)
        .orderBy(col("user_id"))
    }),

    "q16_json_props" -> ((s, dir) => {
      // JSON scalar extraction from the props column
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    "q17_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity"))).cast("long").as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q18_sessionize" -> ((s, dir) => {
      // 30-minute-gap sessionization per user (lag + cumulative sum)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts").cast("timestamp")) -
             unix_micros(col("prev_ts").cast("timestamp"))) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ---- text-analysis operators over documents ------------------------
    "q8_token_counts" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.regexTokenCount(col("text")).as("n_regex_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q9_quality_signals" -> ((s, dir) => {
      TextAnalysis.qualitySignals(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q10_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"))
        .orderBy(col("text_md5"))
    }),

    "q11_lang_distribution" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))
    }),

    "q12_source_rollup" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    "q13_supply_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
            .cast("long").as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // ---- extraction pipeline (non-SQL; golden-tested) ------------------
    "x_extract_pages" -> ((s, _) => {
      val pages = ExtractPipeline.pages(s, 500, 8)
      ExtractPipeline.extract(pages, 8).toDF()
        .select("url", "text", "document_type", "type_confidence",
          "layout_type", "confidence", "status", "language_guess")
        .orderBy(col("url"))
    }),

    "x_extract_fields" -> ((s, _) => {
      val pages = ExtractPipeline.pages(s, 500, 8)
      ExtractPipeline.extract(pages, 8).toDF()
        .select(col("url"), explode(col("fields")).as("f"))
        .select(col("url"), col("f.name").as("field_name"),
          col("f.value").as("field_value"),
          col("f.confidence_level").as("confidence_level"))
        .orderBy(col("url"), col("field_name"))
    }),

    "x_extract_cards" -> ((s, _) => {
      val pages = ExtractPipeline.pages(s, 500, 8)
      ExtractPipeline.extract(pages, 8).toDF()
        .filter(col("card_analysis.detected"))
        .select(col("url"),
          col("card_analysis.candidate_count").as("candidates"),
          col("card_analysis.luhn_valid_count").as("luhn_valid"),
          col("card_analysis.requires_manual_review").as("manual_review"))
        .orderBy(col("url"))
    }),

    // ---- graft SQL expression suite ------------------------------------
    "x_sanitize_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft_sanitize(col("text")).as("sanitized"),
          graft_fingerprint(col("text")).as("fingerprint"),
          graft_simhash(col("text")).as("simhash"),
          graft_confidence(col("text")).as("confidence"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup family ---------------------------------------------------
    "x_minhash_neardups" -> ((s, dir) => {
      Dedup.minhashNearDups(t(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    "x_simhash_neardups" -> ((s, dir) => {
      Dedup.simhashNearDups(t(s, dir, "documents"), maxDistance = 10)
        .orderBy(col("a"), col("b"))
    }),

    // ---- similarity / ANN ----------------------------------------------
    "x_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteCosineTopK(emb, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "x_ann_lsh" -> ((s, dir) => {
      Similarity.lshCosineTopK(t(s, dir, "embeddings"), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "x_cosine_neardups" -> ((s, dir) => {
      Similarity.cosineNearDups(t(s, dir, "embeddings"), threshold = 0.3)
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))
    }),

    "x_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = graft.ops.IvfIndex.train(emb, k = 16)
      graft.ops.IvfIndex.topK(emb, centroids, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "x_url_dedup" -> ((s, _) => {
      // canonical-url dedup over synthesized page urls with injected
      // tracking-param variants
      val pages = graft.pipeline.ExtractPipeline.pages(s, 300, 4).toDF()
        .select(col("url"))
      val variants = pages.withColumn("url",
        concat(col("url"), lit("?utm_source=feed")))
      graft.ops.UrlDedup.dedup(pages.union(variants))
        .select(col("canonical_url"))
        .orderBy(col("canonical_url"))
    }),

    // ---- language id ----------------------------------------------------
    "x_langid" -> ((s, dir) => {
      TextAnalysis.withLanguageId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal plumbing (stubbed codec; real Spark shape) ----------
    "x_multimodal_features" -> ((s, _) => {
      val media = Multimodal.synth(s, 300, 4)
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_frames"), col("bytes"))
        .orderBy(col("media_id"))
    }),

    "x_multimodal_frames" -> ((s, _) => {
      val media = Multimodal.synth(s, 200, 4)
      Multimodal.sampleFrames(Multimodal.extractFeatures(media), stride = 5)
        .select(col("media_id"), col("kind"), col("frame"))
        .orderBy(col("media_id"), col("frame"))
    }),

    // ---- learning-pattern store (S8) + validation gate (O12) ------------
    "x_learning_patterns" -> ((s, _) => {
      val results = graft.pipeline.ExtractPipeline
        .extract(graft.pipeline.ExtractPipeline.pages(s, 500, 8), 8).toDF()
      graft.ops.LearningStore.bestPatterns(
        graft.ops.LearningStore.fromExtraction(results))
        .select(col("doc_type"), col("accuracy_score"), col("version"))
        .orderBy(col("doc_type"))
    }),

    "x_validation_stats" -> ((s, _) => {
      val results = graft.pipeline.ExtractPipeline
        .extract(graft.pipeline.ExtractPipeline.pages(s, 500, 8), 8).toDF()
      graft.ops.ValidationGate.distribution(results)
        .orderBy(col("document_type"))
    }),

    // ---- fintech normalizer (T16-T19) over extracted text ---------------
    "x_extract_normalized" -> ((s, _) => {
      val results = graft.pipeline.ExtractPipeline
        .extract(graft.pipeline.ExtractPipeline.pages(s, 500, 8), 8).toDF()
      val sectionsUdf = udf((t: String) =>
        graft.text.Normalizer.splitSections(t).size)
      val txnUdf = udf((t: String) =>
        graft.text.Normalizer.transactionLines(t).size)
      val itemsUdf = udf((t: String) =>
        graft.text.Normalizer.receiptItems(t).size)
      results.select(col("url"),
        sectionsUdf(col("text")).as("n_sections"),
        txnUdf(col("text")).as("n_txn_lines"),
        itemsUdf(col("text")).as("n_receipt_items"))
        .orderBy(col("url"))
    })
  )

  /** DuckDB-equivalent SQL per SQL-expressible query (same aliases, same
    * ordering; cents-as-BIGINT to keep float association error out of the
    * hash compare). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty, " +
        "CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS base_price_cents, " +
        "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS disc_price_cents, " +
        "count(*) AS count_order " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),

    "q2_top_customers" ->
      ("SELECT c_custkey, c_mktsegment, " +
        "CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_cents, " +
        "count(*) AS order_count " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2 ORDER BY revenue_cents DESC, c_custkey ASC LIMIT 10"),

    "q3_window_rank" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, rank FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank FROM orders) " +
        "WHERE rank <= 3 ORDER BY o_custkey, rank"),

    "q4_event_counts" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(round(sum(value) * 100) AS BIGINT) AS value_cents, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    "q5_event_windows" ->
      ("SELECT CAST(floor(epoch_us(ts) / 300000000) AS BIGINT) AS bucket, " +
        "event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),

    "q6_dedup_first_event" ->
      ("SELECT user_id, event_type, event_id AS first_event_id FROM (" +
        "SELECT user_id, event_type, event_id, " +
        "row_number() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts ASC, event_id ASC) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY user_id, event_type"),

    "q7_best_doc_per_lang" ->
      ("SELECT lang, doc_id AS best_doc, n_chars AS best_chars FROM (" +
        "SELECT lang, doc_id, n_chars, " +
        "row_number() OVER (PARTITION BY lang " +
        "ORDER BY n_chars DESC, doc_id ASC) AS rn FROM documents) " +
        "WHERE rn = 1 ORDER BY lang"),

    "q8_token_counts" ->
      ("SELECT doc_id, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) " +
        "AS n_regex_tokens " +
        "FROM documents ORDER BY doc_id"),

    "q9_quality_signals" ->
      ("SELECT doc_id, length(text) AS n_chars, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "round(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) * 1.0 " +
        "/ greatest(length(text), 1), 6) AS alnum_ratio, " +
        "round(length(regexp_replace(text, '[^.,;:!?''\"()-]', '', 'g')) * 1.0 " +
        "/ greatest(length(text), 1), 6) AS punct_ratio, " +
        "(CASE WHEN regexp_matches(text, '(?i)\\bthe\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\band\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bof\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bto\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bin\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bis\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bthat\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bfor\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bwith\\b') THEN 1 ELSE 0 END + " +
        "CASE WHEN regexp_matches(text, '(?i)\\bwas\\b') THEN 1 ELSE 0 END) " +
        "AS stopword_hits, " +
        "round(least(length(text) * 1.0 / 700.0, 1.0), 6) AS length_score " +
        "FROM documents ORDER BY doc_id"),

    "q10_dedup_exact" ->
      ("SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, " +
        "count(*) AS copies FROM documents GROUP BY 1 ORDER BY 1"),

    "q11_lang_distribution" ->
      ("SELECT lang, count(*) AS n, min(n_chars) AS min_chars, " +
        "max(n_chars) AS max_chars FROM documents GROUP BY 1 ORDER BY 1"),

    "q12_source_rollup" ->
      ("SELECT source, count(*) AS docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY 1 ORDER BY 1"),

    "q17_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "CAST(round(sum(l_quantity)) AS BIGINT) AS qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),

    "q18_sessionize" ->
      ("SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events " +
        "FROM (SELECT user_id, " +
        "sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id " +
        "FROM (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "IS NULL OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY " +
        "user_id ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END " +
        "AS new_session FROM events)) GROUP BY 1 ORDER BY 1"),

    "q14_top_words" ->
      ("SELECT word, count(*) AS n FROM (" +
        "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word " +
        "FROM documents) WHERE length(word) > 0 " +
        "GROUP BY 1 ORDER BY n DESC, word ASC LIMIT 20"),

    "q15_user_set_ops" ->
      ("SELECT user_id FROM (" +
        "SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' " +
        "INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' " +
        "EXCEPT SELECT user_id FROM events GROUP BY user_id HAVING count(*) = 1" +
        ") ORDER BY user_id"),

    "q16_json_props" ->
      ("SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "count(*) AS n FROM events GROUP BY 1 ORDER BY 1"),

    "q13_supply_join" ->
      ("SELECT n_name, " +
        "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) " +
        "AS revenue_cents, count(*) AS n_items " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY 1 ORDER BY 1")
  )
}
