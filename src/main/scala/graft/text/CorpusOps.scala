package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators: vocabulary building and
  * stratified sampling.
  */
object CorpusOps {

  /** Token vocabulary with document frequency: explode → two aggregates.
    * At corpus scale the token shuffle is the dominant cost — counts are
    * partially aggregated map-side, and the top-k is TakeOrdered (no
    * global sort).
    */
  def vocabulary(docs: DataFrame, topK: Int): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topK)

  /** Deterministic stratified sampling by a label column: keeps a row when
    * a uniform hash of its id lands under the stratum's fraction.
    * Hash-based (not RNG-based) so the sample is reproducible across
    * partitionings, retries, and engines — a requirement for auditable
    * training-data pipelines.
    */
  def stratifiedSample(df: DataFrame, label: String, idCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val u = (pmod(xxhash64(col(idCol)), lit(1000000L)).cast("double") / 1000000.0)
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(label) === k, lit(f)).otherwise(acc)
    }
    df.filter(u < frac)
  }

  // ---- queries -----------------------------------------------------------

  val qVocab = GraftQuery(
    "q46_vocabulary",
    (s, dir) => vocabulary(Tables.documents(s, dir), 100),
    Some("""
      SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents) t
      GROUP BY token
      ORDER BY tf DESC, token
      LIMIT 100"""))

  /** Deterministic hash-based stratified sample — expressible in DuckDB
    * with the same hash? No (xxhash64 is Spark-specific) → rows-only;
    * proportions pinned in the spec.
    */
  val qStratified = GraftQuery(
    "q47_stratified_sample",
    (s, dir) =>
      stratifiedSample(Tables.documents(s, dir), "lang", "doc_id",
        Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.25, "fr" -> 0.25, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
    None)

  val queries: Seq[GraftQuery] = Seq(qVocab, qStratified)
}
