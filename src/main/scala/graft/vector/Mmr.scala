package graft.vector

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) re-ranking: diversify a retrieval
  * result by iteratively picking argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s)
  * (Carbonell & Goldstein 1998) — the standard de-redundancy stage behind
  * RAG retrieval and training-example selection.
  *
  * Scale shape — the production rerank split: scoring the corpus against
  * the query is a distributed narrow map (query broadcast, no corpus
  * shuffle) and pool selection is TakeOrdered (no global sort); the MMR
  * loop itself then runs on the collected POOL — a constant-size set
  * (poolSize·dim doubles, here 50·64) that is bounded BY CONSTRUCTION, the
  * same bounded-collect class as the IVF centroid loop. The O(pool²·dim)
  * rerank cost is corpus-independent; a bigger pool is a knob, not a
  * scale term.
  *
  * Determinism: every similarity is the same sequential double fold as
  * the q28 kernel (dot/(na·nb), norms computed once per row), scores are
  * fixed-order double expressions, ties break on vec_id — so the pick
  * sequence is bit-reproducible and the DuckDB oracle (pool + k unrolled
  * pick CTEs generated from the same loop) is exact.
  */
object Mmr {

  val Lambda = 0.5
  val PoolSize = 50
  val K = 10

  /** Returns (rank, vec_id, rel, max_sim, score) for the k MMR picks.
    * `query` is a single row with column `qv`; `corpus` has
    * (vec_id, embedding).
    */
  def mmrRerank(corpus: DataFrame, query: DataFrame, k: Int = K,
                poolSize: Int = PoolSize, lambda: Double = Lambda): DataFrame = {
    require(k >= 1 && k <= poolSize, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val pool = corpus.crossJoin(broadcast(query))
      .withColumn("rel", VectorExprs.cosineSim(col("embedding"), col("qv")))
      .select(col("vec_id"), col("embedding"), col("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolSize)
    // bounded collect: poolSize rows by construction (see scaladoc)
    val rows: Array[(Long, Array[Double], Double)] = pool.collect().map { r: Row =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getDouble(2))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s = s + a(i) * b(i); i += 1 } // left fold, kernel order
      s
    }
    val norms = rows.map { case (_, e, _) => math.sqrt(dot(e, e)) }
    def cos(i: Int, j: Int): Double =
      if (norms(i) == 0 || norms(j) == 0) 0.0
      else dot(rows(i)._2, rows(j)._2) / (norms(i) * norms(j))
    val maxSim = Array.fill(rows.length)(-1.0) // empty-set sentinel: first pick is pure relevance
    val picked = Array.fill(rows.length)(false)
    val out = Seq.newBuilder[(Int, Long, Double, Double, Double)]
    // a pool smaller than k (including empty — empty corpus or query)
    // yields pool.length picks, not a crash: the argmax below has no
    // candidate once every row is picked
    (1 to math.min(k, rows.length)).foreach { rank =>
      var best = -1
      var bestScore = Double.NegativeInfinity
      rows.indices.foreach { i =>
        if (!picked(i)) {
          val score = lambda * rows(i)._3 - (1.0 - lambda) * maxSim(i)
          if (score > bestScore || (score == bestScore && best >= 0 && rows(i)._1 < rows(best)._1)) {
            best = i; bestScore = score
          }
        }
      }
      picked(best) = true
      out += ((rank, rows(best)._1, rows(best)._3, maxSim(best), bestScore))
      rows.indices.foreach { i =>
        if (!picked(i)) maxSim(i) = math.max(maxSim(i), cos(i, best))
      }
    }
    val sp = corpus.sparkSession
    import sp.implicits._
    out.result().toDF("rank", "vec_id", "rel", "max_sim", "score")
      .orderBy(col("rank"))
  }

  // ---- oracle generation ---------------------------------------------------

  /** Sequential double dot fold over two list expressions — the q28 kernel. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(generate_series(1, len($a)),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** One pick round: score remaining pool rows against sel(i-1), take the
    * argmax, append. Generated from the same loop as the Spark impl.
    */
  private def duckRounds(k: Int, lambda: Double): String =
    (1 to k).map { i =>
      s"""ms$i AS MATERIALIZED (
         |  SELECT p.vec_id,
         |         max(CASE WHEN p.nrm = 0 OR s.nrm = 0 THEN 0.0
         |                  ELSE ${dotSql("p.embedding", "s.embedding")}
         |                       / (p.nrm * s.nrm) END) AS ms
         |  FROM pool p JOIN pool s
         |    ON s.vec_id IN (SELECT vec_id FROM sel${i - 1})
         |   AND p.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |  GROUP BY p.vec_id),
         |pick$i AS MATERIALIZED (
         |  SELECT $i AS rank, p.vec_id, p.rel,
         |         coalesce(m.ms, -1.0) AS max_sim,
         |         $lambda * p.rel - ${1.0 - lambda} * coalesce(m.ms, -1.0) AS score
         |  FROM pool p LEFT JOIN ms$i m ON p.vec_id = m.vec_id
         |  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |  ORDER BY score DESC, p.vec_id LIMIT 1),
         |sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1}
         |          UNION ALL SELECT rank, vec_id, rel, max_sim, score FROM pick$i)""".stripMargin
    }.mkString(",\n")

  // ---- queries -------------------------------------------------------------

  val qMmr = GraftQuery(
    "q111_mmr_rerank",
    (s, dir) => mmrRerank(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))),
    Some(s"""
      WITH q AS (SELECT embedding AS qv FROM (SELECT * FROM embeddings WHERE NOT coalesce(list_bool_or(list_transform(embedding, __fe -> isnan(__fe) OR isinf(__fe))), FALSE)) embeddings WHERE vec_id = 0),
      scored AS MATERIALIZED (
        SELECT vec_id, embedding,
               ${dotSql("embedding", "qv")} AS dt,
               sqrt(${dotSql("embedding", "embedding")}) AS nrm,
               sqrt(${dotSql("qv", "qv")}) AS nq
        FROM (SELECT * FROM embeddings WHERE NOT coalesce(list_bool_or(list_transform(embedding, __fe -> isnan(__fe) OR isinf(__fe))), FALSE)) embeddings CROSS JOIN q),
      pool AS MATERIALIZED (
        SELECT vec_id, embedding, nrm,
               CASE WHEN nrm = 0 OR nq = 0 THEN 0.0 ELSE dt / (nrm * nq) END AS rel
        FROM scored
        ORDER BY rel DESC, vec_id LIMIT $PoolSize),
      sel0 AS MATERIALIZED (
        SELECT CAST(NULL AS INTEGER) AS rank, CAST(NULL AS BIGINT) AS vec_id,
               CAST(NULL AS DOUBLE) AS rel, CAST(NULL AS DOUBLE) AS max_sim,
               CAST(NULL AS DOUBLE) AS score
        WHERE false),
      ${duckRounds(K, Lambda)}
      SELECT rank, vec_id, rel, max_sim, score FROM sel$K ORDER BY rank"""))

  val queries: Seq[GraftQuery] = Seq(qMmr)
}
