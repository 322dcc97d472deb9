package graft.vector

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic negative sampling for contrastive training: every
  * anchor draws k different-label negatives from a bounded candidate
  * pool, pseudo-randomly but reproducibly (the md5-hash race idiom) —
  * the "in-batch negatives" construction, made run-stable so training
  * data is identical across reruns and repartitions.
  *
  * Scale shape: the pool is the TakeOrdered top-C by id-hash (one pass,
  * C rows broadcast); each anchor fans out to ≤C candidates in a narrow
  * broadcast join, and the per-anchor rank window is bounded at C by
  * construction — never corpus×corpus. Corpus vectors are never
  * shuffled.
  */
object NegativeSampling {

  private def md5Base(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** (anchor_id, rank, neg_id, neg_label): k negatives per anchor from
    * a C-candidate pool; anchors whose label covers the whole pool
    * emit fewer (possibly zero) rows.
    */
  def sampleNegatives(embs: DataFrame, poolSize: Int, k: Int): DataFrame = {
    require(poolSize >= 1 && k >= 1 && k <= poolSize,
      s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    val pool = embs
      .select(col("vec_id").as("neg_id"), col("label").as("neg_label"),
        md5Base(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("neg_id"))
      .limit(poolSize)
      .select(col("neg_id"), col("neg_label"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("pair_h"), col("neg_id"))
    embs.select(col("vec_id").as("anchor_id"), col("label"))
      .join(broadcast(pool),
        col("label") =!= col("neg_label") && col("anchor_id") =!= col("neg_id"))
      .withColumn("pair_h", md5Base(
        concat(col("anchor_id").cast("string"), lit(":"),
          col("neg_id").cast("string"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("neg_id"), col("neg_label").cast("long").as("neg_label"))
      .orderBy(col("anchor_id"), col("rank"))
  }

  // ---- queries -------------------------------------------------------------

  val qNegatives = GraftQuery(
    "q180_negative_sampling",
    (s, dir) => sampleNegatives(Tables.embeddings(s, dir), poolSize = 64, k = 4), {
      val base = graft.text.Md5P61.duckBase("CAST(vec_id AS VARCHAR)")
      val pairBase = graft.text.Md5P61.duckBase(
        "CAST(anchor_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR)")
      Some(s"""
      WITH pool AS (
        SELECT vec_id AS neg_id, label AS neg_label
        FROM (SELECT * FROM embeddings WHERE NOT coalesce(list_bool_or(list_transform(embedding, __fe -> isnan(__fe) OR isinf(__fe))), FALSE)) embeddings
        ORDER BY $base, vec_id
        LIMIT 64),
      fanout AS (
        SELECT e.vec_id AS anchor_id, p.neg_id,
               CAST(p.neg_label AS BIGINT) AS neg_label
        FROM (SELECT * FROM embeddings WHERE NOT coalesce(list_bool_or(list_transform(embedding, __fe -> isnan(__fe) OR isinf(__fe))), FALSE)) e JOIN pool p
          ON e.label <> p.neg_label AND e.vec_id <> p.neg_id),
      ranked AS (
        SELECT anchor_id, neg_id, neg_label,
               CAST(row_number() OVER (PARTITION BY anchor_id
                 ORDER BY $pairBase, neg_id) AS BIGINT) AS rank
        FROM fanout)
      SELECT anchor_id, rank, neg_id, neg_label
      FROM ranked WHERE rank <= 4
      ORDER BY anchor_id, rank""")
    })

  val queries: Seq[GraftQuery] = Seq(qNegatives)
}
