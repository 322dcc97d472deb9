package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Training-sequence preparation: sliding-window chunking (packing docs
  * into fixed context windows) and unigram-frequency rarity scoring (the
  * integer-exact perplexity proxy). Both are pre-training staples with no
  * reference analog — extension-set operators beside [[Repetition]].
  *
  * At 100 TB:
  *  - chunking is a generator expression (sequence + explode + slice) —
  *    fully narrow, no shuffle at all; output rows carry only their own
  *    chunk text, so downstream repartitioning pays O(output), not
  *    O(docs × window);
  *  - rarity scoring shuffles (token, count) scalars for the corpus
  *    frequency table and broadcasts it for a map-side lookup join —
  *    Zipf-bounded vocabularies (1e6-1e8 tokens) broadcast in tens of MB;
  *    past the broadcast threshold Spark's stats fall back to a sort-merge
  *    join on the token key, which is still O(tokens) and skew-tolerant
  *    (no key is a constant fraction of the corpus after stoplisting).
  */
object CorpusPrep {

  /** Slide a `window`-token frame by `stride` over each document: chunk i
    * covers tokens [i·stride, i·stride + window). Every token is covered
    * (the last start is the smallest multiple of stride reaching the
    * tail), short docs yield one short chunk, and overlap = window −
    * stride gives the context continuity training pipelines want.
    */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"chunkDocuments window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"chunkDocuments stride must be in [1, window], got $stride (window $window)")
    val start = col("chunk_id") * stride
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .withColumn("n_chunks",
        when(col("n") <= window, lit(1))
          .otherwise(floor((col("n") - window + (stride - 1)) / stride).cast("int") + 1))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("toks"), start + 1,
          least(lit(window), col("n") - start))).as("chunk_text"),
        least(lit(window), col("n") - start).as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Unigram-LM scoring with an exact integer witness: per document, the
    * total and mean corpus frequency of its tokens. Low mean_cf = rare
    * vocabulary (specialist or noisy text), high = boilerplate — the
    * shape of perplexity filtering without the float-log nondeterminism
    * (total_cf is an integer sum, so the result is order- and
    * partitioning-independent bit-for-bit).
    */
  def rarityScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
    toks.join(broadcast(cf), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cf")).as("total_cf"))
      .withColumn("mean_cf", col("total_cf") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val qChunk = GraftQuery(
    "q64_sequence_chunks",
    (s, dir) => chunkDocuments(Tables.documents(s, dir), window = 32, stride = 24),
    Some("""
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                 FROM documents),
      c AS (SELECT doc_id, toks, len(toks) AS n,
              CASE WHEN len(toks) <= 32 THEN 1
                   ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
            FROM t)
      SELECT doc_id, i AS chunk_id,
             array_to_string(toks[i*24 + 1 : i*24 + least(32, n - i*24)], ' ')
               AS chunk_text,
             least(32, n - i*24) AS chunk_tokens
      FROM (SELECT doc_id, toks, n, unnest(generate_series(0, n_chunks - 1)) AS i
            FROM c) s
      ORDER BY doc_id, chunk_id"""))

  val qRarity = GraftQuery(
    "q65_rarity_score",
    (s, dir) => rarityScore(Tables.documents(s, dir)),
    Some("""
      WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                 FROM documents),
      cf AS (SELECT tok, count(*) AS cf FROM t GROUP BY tok)
      SELECT t.doc_id AS doc_id, count(*) AS n_tokens,
             CAST(sum(cf.cf) AS BIGINT) AS total_cf,
             CAST(CAST(sum(cf.cf) AS BIGINT) AS DOUBLE) / count(*) AS mean_cf
      FROM t JOIN cf ON t.tok = cf.tok
      GROUP BY t.doc_id
      ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qChunk, qRarity)
}
