package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus filter cascade with per-stage attrition: the C4/RefinedWeb
  * cleaning funnel — blank → length → quality → language → exact-dup —
  * reported as cumulative survivor counts per source, the go/no-go
  * artifact every corpus-cleaning run ships with.
  *
  * Scale shape: every stage flag is a narrow map over the corpus; the
  * only shuffles are the text-hash dedup rank (hash-keyed, text itself
  * never shuffles beyond the digest) and the final O(sources) rollup.
  * Stage flags compose with AND, so one pass computes every cumulative
  * count — the funnel is an aggregate, not five filtered scans.
  */
object FilterCascade {

  val MinChars = 100
  val MinQuality = 0.7
  val KeepLang = "en"

  /** Per-source attrition: (source, n_total, s1_nonblank, s2_length,
    * s3_quality, s4_lang, s5_unique, tok_final). Counts are cumulative —
    * s_k counts docs passing stages 1..k; tok_final is the surviving
    * token mass. Exact-dup keeps the lowest doc_id of each text hash
    * CORPUS-WIDE (a cross-source duplicate survives only in the source
    * holding its first occurrence).
    */
  /** Per-doc cumulative flags for the PER-ROW stages 1-4 (blank, length,
    * quality, language) — shared by the batch report and the streaming
    * gate ([[graft.streaming.DocsStream]]), so the two can never drift.
    * Stage 5 (exact-dup) needs cross-row state and lives with each
    * runner. Works on batch and streaming frames alike (narrow
    * expressions only).
    */
  def stageFlags(docs: DataFrame): DataFrame =
    docs.select(
      col("source"), col("doc_id"),
      length(col("text")).cast("double").as("n_chars"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.languageId(col("text")).as("pred_lang"),
      md5(col("text")).as("text_hash"))
      .withColumn("p1", col("n_tok") > 0)
      .withColumn("p2", col("p1") && col("n_chars") >= MinChars)
      .withColumn("p3", col("p2") && col("quality") >= MinQuality)
      .withColumn("p4", col("p3") && col("pred_lang") === KeepLang)

  def cascadeReport(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    stageFlags(docs)
      .withColumn("first_of_hash", row_number().over(w) === 1)
      .withColumn("p5", col("p4") && col("first_of_hash"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("s1_nonblank"),
        sum(when(col("p2"), 1L).otherwise(0L)).as("s2_length"),
        sum(when(col("p3"), 1L).otherwise(0L)).as("s3_quality"),
        sum(when(col("p4"), 1L).otherwise(0L)).as("s4_lang"),
        sum(when(col("p5"), 1L).otherwise(0L)).as("s5_unique"),
        sum(when(col("p5"), col("n_tok")).otherwise(0L)).as("tok_final"))
      .orderBy(col("source"))
  }

  // ---- queries -------------------------------------------------------------

  val qCascade = GraftQuery(
    "q169_filter_cascade",
    (s, dir) => cascadeReport(Tables.documents(s, dir)),
    // quality/lang transliterations shared with the q22/q23 oracles
    Some("""
      WITH t AS (
        SELECT source, doc_id, md5(text) AS text_hash,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tok,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('the','a','an','and','or','of','to','in','is','it')))
                 AS DOUBLE) AS n_stop,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('the','and','of','to','is'))) AS score_en,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('der','die','das','und','ist'))) AS score_de,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('el','la','los','que','es'))) AS score_es,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('le','la','les','et','est'))) AS score_fr,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('de','shi','bu','le','wo'))) AS score_zh
        FROM documents),
      m AS (
        SELECT source, doc_id, text_hash, n_chars, n_tok,
               least(n_chars / 500.0, 1.0) * 0.4
                 + (CASE WHEN (CASE WHEN n_tok > 0
                       THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END) >= 3
                     AND (CASE WHEN n_tok > 0
                       THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END) <= 10
                    THEN 1.0 ELSE 0.5 END) * 0.3
                 + (CASE WHEN (CASE WHEN n_tok > 0
                       THEN n_stop / n_tok ELSE 0.0 END) > 0.01
                     AND (CASE WHEN n_tok > 0
                       THEN n_stop / n_tok ELSE 0.0 END) < 0.5
                    THEN 1.0 ELSE 0.5 END) * 0.3 AS quality,
               CASE WHEN greatest(score_en, score_de, score_es, score_fr,
                                  score_zh) <= 0 THEN 'und'
                    WHEN score_en = greatest(score_en, score_de, score_es,
                                  score_fr, score_zh) THEN 'en'
                    WHEN score_de = greatest(score_en, score_de, score_es,
                                  score_fr, score_zh) THEN 'de'
                    WHEN score_es = greatest(score_en, score_de, score_es,
                                  score_fr, score_zh) THEN 'es'
                    WHEN score_fr = greatest(score_en, score_de, score_es,
                                  score_fr, score_zh) THEN 'fr'
                    ELSE 'zh' END AS pred_lang
        FROM t),
      flagged AS (
        SELECT source, n_tok,
               n_tok > 0 AS p1,
               n_tok > 0 AND n_chars >= 100 AS p2,
               n_tok > 0 AND n_chars >= 100 AND quality >= 0.7 AS p3,
               n_tok > 0 AND n_chars >= 100 AND quality >= 0.7
                 AND pred_lang = 'en' AS p4,
               n_tok > 0 AND n_chars >= 100 AND quality >= 0.7
                 AND pred_lang = 'en'
                 AND row_number() OVER (PARTITION BY text_hash
                                        ORDER BY doc_id) = 1 AS p5
        FROM m)
      SELECT source, CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1_nonblank,
             CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2_length,
             CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS s3_quality,
             CAST(sum(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS s4_lang,
             CAST(sum(CASE WHEN p5 THEN 1 ELSE 0 END) AS BIGINT) AS s5_unique,
             CAST(sum(CASE WHEN p5 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_final
      FROM flagged GROUP BY source ORDER BY source"""))

  val queries: Seq[GraftQuery] = Seq(qCascade)
}
