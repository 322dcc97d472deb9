package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Readability scoring (Flesch reading-ease shape): per-document word,
  * sentence and syllable counts from shared-dialect regexes, folded into
  * the classic 206.835 − 1.015·(w/s) − 84.6·(syl/w) score — a corpus
  * quality signal next to q22's ratio-based score (curation pipelines
  * routinely bucket on readability to balance simple/complex text).
  *
  * Determinism: counts are integers from regexes valid in BOTH engines'
  * dialects (character classes only — no \\b, no lookaround); the score is
  * one fixed-order double expression per row, so results are bit-identical
  * with no rounding machinery. The syllable count is the standard
  * vowel-group heuristic (a [aeiouy]+ run ≈ one syllable).
  *
  * Scale shape: pure narrow map over the text column — no shuffle, no
  * UDF (regexp_count is a codegen'd Catalyst expression); the one
  * output-edge sort is the oracle-comparison contract.
  */
object Readability {

  def readabilityScores(docs: DataFrame): DataFrame = {
    val words = regexp_count(lower(col("text")), lit("[a-z]+"))
    val syllables = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
    docs.select(
      col("doc_id"),
      words.as("n_words"),
      sentences.as("n_sentences"),
      syllables.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")))
      .orderBy(col("doc_id"))
  }

  // ---- queries -------------------------------------------------------------

  val qReadability = GraftQuery(
    "q108_readability",
    (s, dir) => readabilityScores(Tables.documents(s, dir)),
    Some("""
      WITH c AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
             206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
      FROM c WHERE n_words > 0
      ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qReadability)
}
