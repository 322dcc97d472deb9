package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed inverted-index construction: token → ascending posting list
  * of the doc_ids containing it, materialized in doc-id-range CONTAINERS
  * (the Roaring-bitmap / Lucene layout: container = doc_id >> bits) rather
  * than fixed-count blocks.
  *
  * The container layout is what makes this scale-correct: a fixed-count
  * block layout needs a global per-token rank (a window partitioned by
  * token — one task eats the hottest token's entire posting list), while
  * containers need NO window at all. Per (token, container) the aggregation
  * state is bounded by the container width (≤ 2^bits doc ids) at any corpus
  * size, the hottest token just spreads over more containers, and the one
  * shuffle moves exactly the index's own content: (token, doc_id) pairs,
  * already deduplicated per document on the map side.
  */
object InvertedIndex {

  /** @param bits container width: container id = doc_id >> bits */
  def invertedIndex(docs: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 32,
      s"invertedIndex bits must be in [1, 32], got $bits")
    docs
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token"), shiftright(col("doc_id"), bits).as("container"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("token"), col("container"),
        size(col("ids")).cast("long").as("n_docs"),
        concat_ws(",", transform(col("ids"), _.cast("string"))).as("postings"))
      .orderBy(col("token"), col("container"))
  }

  // ---- queries -------------------------------------------------------------

  /** q75: bits=8 so the sf corpora span several containers. */
  val qInvertedIndex = GraftQuery(
    "q75_inverted_index",
    (s, dir) => invertedIndex(Tables.documents(s, dir), bits = 8),
    Some("""
      WITH td AS (
        SELECT DISTINCT doc_id, token FROM (
          SELECT doc_id,
                 unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
          FROM documents)
      )
      SELECT token, doc_id >> 8 AS container,
             count(*) AS n_docs,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      FROM td
      GROUP BY token, doc_id >> 8
      ORDER BY token, container"""))

  val queries: Seq[GraftQuery] = Seq(qInvertedIndex)
}
