package graft.vector

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (baseline) and an
  * LSH-bucketed approximate variant (the scale path), plus embedding-cosine
  * near-duplicate detection.
  *
  * Vector math: hot paths use the native kernel expressions in
  * VectorExprs (tight per-row loops); `dot`/`cosine` below are the
  * composable zip_with/aggregate reference forms, bit-equal to the native
  * CosineSim (pinned by SimilaritySpec). Elements are cast float→double
  * BEFORE any arithmetic so results match a sequential double-fold oracle.
  *
  * Scale design: brute-force is a broadcast of the (tiny) query vector —
  * a narrow map + top-k (TakeOrdered), no shuffle of the corpus. The LSH
  * variant buckets by deterministic random-hyperplane signs, turning ANN
  * into a hash-partition join: at 100 TB the corpus shuffles once by bucket
  * key and each probe touches 1/2^planes of the data.
  */
object Similarity {

  /** Element-wise dot product of two float-array columns in double
    * precision, sequential left-to-right accumulation.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Brute-force cosine top-k of `corpus` against the single-row `query`
    * (must have column `qv`). TakeOrderedAndProject — no global sort.
    */
  def cosineTopK(corpus: DataFrame, query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .withColumn("cos_sim", VectorExprs.cosineSim(col("embedding"), col("qv")))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)

  /** Batched brute-force top-k: one pass over the corpus scores EVERY
    * query vector (a broadcast batch, e.g. a probe set or dedup frontier)
    * — the realistic retrieval shape. Per-query top-k comes from
    * row_number over (query_id), which plans as WindowGroupLimit: each
    * map task keeps only k rows per query BEFORE the shuffle, so the
    * exchange carries ≤ partitions·queries·k rows regardless of corpus
    * size.
    */
  def cosineTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .withColumn("cos_sim", VectorExprs.cosineSim(col("embedding"), col("qv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cos_sim"))
  }

  /** ANN via LSH buckets with multi-probe: exact cosine ranking within the
    * query's bucket PLUS every Hamming-distance-1 neighbor bucket
    * (planes+1 probes). Single-bucket probing collapses in recall as
    * planes grow (the nearest neighbors differ from the query in one
    * hyperplane sign with probability ≈ θ/π per plane); probing the
    * 1-flip neighborhood recovers exactly those, at O(planes) extra
    * bucket lookups — still a broadcast hash join against the streamed
    * corpus, no corpus shuffle, ~(planes+1)/2^planes of the data scanned.
    */
  def annLsh(corpus: DataFrame, query: DataFrame, k: Int, planes: Int = 6): DataFrame = {
    val bucketed = corpus.withColumn("bucket", VectorExprs.lshBucket(col("embedding"), planes))
    val qb = query.withColumn("qbucket", VectorExprs.lshBucket(col("qv"), planes))
    val probeCols: Seq[Column] = col("qbucket") +:
      (0 until planes).map(p => col("qbucket").bitwiseXOR(lit(1L << p)))
    // distinct probe buckets → each corpus row matches at most one probe
    val probes = qb.select(col("qv"), explode(array(probeCols: _*)).as("probe"))
    bucketed.join(broadcast(probes), col("bucket") === col("probe"))
      .withColumn("cos_sim", VectorExprs.cosineSim(col("embedding"), col("qv")))
      .select(col("vec_id"), col("label"), col("bucket"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked by LSH bucket so the
    * pair space is bucket-local (standard dedup blocking at scale).
    * `maxBucketSize` bounds the O(bucket²) self-join: a hot bucket
    * (near-constant embeddings) is dropped with a logged warning — massive
    * duplicate clusters belong to the canonical-assignment APIs, not pair
    * emission.
    */
  def embeddingDupPairs(corpus: DataFrame, threshold: Double, planes: Int = 6,
                        maxBucketSize: Int = 1000): DataFrame = {
    val bucketed = graft.text.TextDedup.capBuckets(
      corpus.select(col("vec_id"), col("embedding"),
        VectorExprs.lshBucket(col("embedding"), planes).as("bucket")),
      Seq("bucket"), maxBucketSize, "embeddingDupPairs")
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", VectorExprs.cosineSim(col("emb_a"), col("emb_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Scalable embedding dedup output: one row per vector with at most
    * `tables` canonical candidates — each independent hyperplane family
    * contributes its bucket's minimum vec_id, candidates are
    * cosine-verified, and the minimum verified id wins. One hash table
    * alone is fragile (a non-duplicate lower-id bucketmate fails
    * verification and blocks the collapse); OR-amplification across
    * tables makes a true duplicate share SOME bucket with its canonical
    * with probability 1 − (1 − p^planes)^tables. O(corpus·tables) rows
    * end-to-end, never pairs — mirrors TextDedup.minhashCanonical (whose
    * bands play the same role).
    */
  def embeddingCanonical(corpus: DataFrame, threshold: Double,
                         planes: Int = 6, tables: Int = 3): DataFrame = {
    val vecs = corpus.select(col("vec_id"), col("embedding")).cache()
    val candidates = (0 until tables).map { t =>
      val bucketed = vecs.select(col("vec_id"), col("embedding"),
        VectorExprs.lshBucket(col("embedding"), planes, t * planes).as("bucket"))
      val bucketMin = bucketed.groupBy(col("bucket"))
        .agg(min(col("vec_id")).as("bucket_min"))
      bucketed.join(bucketMin, "bucket")
        .filter(col("bucket_min") < col("vec_id"))
        .select(col("vec_id"), col("bucket_min").as("cand"))
    }.reduce(_ unionByName _).distinct()
    val verified = candidates
      .join(vecs, "vec_id")
      .join(vecs.select(col("vec_id").as("cand"),
        col("embedding").as("emb_c")), "cand")
      .filter(VectorExprs.cosineSim(col("embedding"), col("emb_c")) >= threshold)
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).as("canonical_id"))
    vecs.select(col("vec_id"))
      .join(verified, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("canonical_id"), col("vec_id")).as("canonical_id"))
      .withColumn("is_canonical", col("vec_id") === col("canonical_id"))
  }

  // ---- query wrappers ----------------------------------------------------

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  /** Brute-force cosine top-20 vs vec_id=0. Oracle computes the identical
    * double-precision sequential fold via list_reduce on a zipped pair list.
    */
  val qBruteForce = GraftQuery(
    "q28_ann_bruteforce",
    (s, dir) =>
      cosineTopK(Tables.embeddings(s, dir), queryVec(s, dir), 20),
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT vec_id, label,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(embedding)),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
            (acc, v) -> acc + v) AS dot,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(embedding)),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
            (acc, v) -> acc + v)) AS n_a,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(qv)),
              i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
            (acc, v) -> acc + v)) AS n_q
        FROM embeddings CROSS JOIN q)
      SELECT vec_id, label,
        CASE WHEN n_a = 0 OR n_q = 0 THEN 0.0 ELSE dot / (n_a * n_q) END AS cos_sim
      FROM scored
      ORDER BY cos_sim DESC, vec_id
      LIMIT 20"""))

  /** Batched top-10 for three query vectors — oracle computes the same
    * sequential double-fold cosine and row_number in DuckDB.
    */
  val qBatchTopK = GraftQuery(
    "q54_ann_batch",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val queries = e.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      cosineTopKBatch(e, queries, 10)
        .orderBy(col("query_id"), col("rn"))
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)),
      scored AS (
        SELECT q.query_id, e.vec_id,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))),
            (acc, v) -> acc + v) AS dot,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
            (acc, v) -> acc + v)) AS n_e,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(q.qv)),
              i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))),
            (acc, v) -> acc + v)) AS n_q
        FROM embeddings e CROSS JOIN q),
      ranked AS (
        SELECT query_id, vec_id,
          CASE WHEN n_e = 0 OR n_q = 0 THEN 0.0 ELSE dot / (n_e * n_q) END AS cos_sim
        FROM scored),
      topk AS (
        SELECT query_id, vec_id, cos_sim,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, vec_id) AS rn
        FROM ranked)
      SELECT query_id, rn, vec_id, cos_sim
      FROM topk
      WHERE rn <= 10
      ORDER BY query_id, rn"""))

  /** LSH-bucketed ANN — xxhash64-based, rows-only check (ScalaTest compares
    * recall vs brute force).
    */
  val qAnnLsh = GraftQuery(
    "q29_ann_lsh",
    (s, dir) =>
      annLsh(Tables.embeddings(s, dir), queryVec(s, dir), 20),
    None)

  /** Embedding near-dup pairs with planted duplicates (corpus vectors are
    * random — near-exact pairs only exist if we plant them).
    */
  val qEmbeddingDedup = GraftQuery(
    "q30_embedding_dedup",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val planted = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + 1000000).as("vec_id"),
        col("embedding"), col("label"))
      embeddingDupPairs(
        e.unionByName(planted).select(col("vec_id"), col("embedding")),
        threshold = 0.999)
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  /** Canonical embedding dedup over embeddings + planted exact copies —
    * O(corpus) output rows regardless of cluster sizes.
    */
  val qEmbeddingCanonical = GraftQuery(
    "q56_embedding_canonical",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val planted = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      embeddingCanonical(
        e.select(col("vec_id"), col("embedding")).unionByName(planted),
        threshold = 0.999)
        .orderBy(col("vec_id"))
    },
    None)

  val queries: Seq[GraftQuery] =
    Seq(qBruteForce, qBatchTopK, qAnnLsh, qEmbeddingDedup, qEmbeddingCanonical)
}
