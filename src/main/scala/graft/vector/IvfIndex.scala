package graft.vector

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: k-means-style coarse
  * quantization into `nlist` cells, search probes only the `nprobe` nearest
  * cells' inverted lists.
  *
  * Everything is DataFrame-distributed:
  *  - training: Lloyd iterations where assignment is a broadcast-join argmin
  *    and the centroid update is an element-wise mean via posexplode +
  *    (cell, dim) aggregation — shuffles keys and scalars, never gathers
  *    vectors to the driver;
  *  - initial centroids are the deterministic first-`nlist` vectors by id
  *    (reproducible; k-means++ would add selection passes);
  *  - search: nprobe nearest centroids (tiny broadcast) → semi-join on
  *    cell id → exact cosine rank within the probed lists.
  *
  * At 100 TB: the corpus shuffles once per Lloyd iteration (bounded, small
  * fixed count) and once at index build; a query touches ~nprobe/nlist of
  * the data. Compare annLsh (hyperplane buckets, no training).
  */
object IvfIndex {

  /** Assign each vector to its nearest centroid (max cosine). */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("sim", VectorExprs.cosineSim(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"),
        first(col("embedding")).as("embedding"))

  /** Element-wise mean of each cell's vectors → new centroids. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"),
        transform(col("dm"), e => e.getField("m").cast("float")).as("centroid"))

  private def cosSeq(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** k-means||-style initial centroids (Bahmani et al.): a few rounds of
    * distance²-proportional oversampling (deterministic xxhash64 coin
    * flips — reproducible across partitionings), then the ≤ 2·nlist·rounds
    * candidates are weighted by population and reduced to nlist centers
    * driver-side via weighted farthest-point selection. Replaces the
    * first-nlist-by-id init, which degenerates on sorted corpora (the id
    * prefix is one region of the space → all seeds in one cluster).
    * Each round is one broadcast-join aggregate over the corpus — no
    * vector gather; only the tiny candidate set ever reaches the driver.
    */
  private[vector] def initCentroids(corpus: DataFrame, nlist: Int,
                                    rounds: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val l = 2 * nlist // oversampling factor per round
    val vecs = corpus.select(col("vec_id"), col("embedding"))

    // deterministic seed: the vector with minimum id hash
    var candidates: Vector[(Long, Seq[Float])] = Vector(
      vecs.withColumn("h", xxhash64(col("vec_id")))
        .orderBy(col("h"), col("vec_id")).limit(1)
        .as[(Long, Seq[Float], Long)].collect().map(t => (t._1, t._2)).head)

    (0 until rounds).foreach { r =>
      val candDf = broadcast(
        candidates.map(_._2).zipWithIndex.map(_.swap).toDF("cell", "centroid"))
      // d² to the current candidate set, per vector (cosine distance)
      val scored = vecs.crossJoin(candDf)
        .withColumn("sim", VectorExprs.cosineSim(col("embedding"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"), max(col("sim")).as("best"))
        .withColumn("d2", pow(lit(1.0) - col("best"), 2))
        .cache()
      val total = scored.agg(sum(col("d2"))).as[Double].collect().head
      if (total > 0) {
        // Bernoulli(min(1, l·d²/Σd²)) with a deterministic hash as the coin
        val u = pmod(xxhash64(col("vec_id"), lit(r)), lit(1000000000L))
          .cast("double") / 1e9
        val picked = scored
          .filter(u < least(lit(1.0), lit(l.toDouble) * col("d2") / lit(total)))
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Seq[Float])].collect()
        val known = candidates.map(_._1).toSet
        candidates = candidates ++ picked.filterNot(p => known(p._1))
      }
      scored.unpersist()
    }
    // too few candidates (tiny/degenerate corpora): pad by id-hash order
    if (candidates.length < nlist) {
      val known = candidates.map(_._1).toSet
      val pad = vecs.withColumn("h", xxhash64(col("vec_id")))
        .orderBy(col("h"), col("vec_id")).limit(nlist + candidates.length)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
        .filterNot(p => known(p._1)).take(nlist - candidates.length)
      candidates = candidates ++ pad
    }

    // weight candidates by the population they attract (one aggregate)
    val candDf = broadcast(
      candidates.map(_._2).zipWithIndex.map(_.swap).toDF("cell", "centroid"))
    val weights = vecs.crossJoin(candDf)
      .withColumn("sim", VectorExprs.cosineSim(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("w"))
      .as[(Int, Long)].collect().toMap

    // driver-side weighted farthest-point reduction to nlist centers
    val embs = candidates.map(_._2)
    val w = embs.indices.map(i => weights.getOrElse(i, 0L).toDouble max 1.0)
    val firstIdx = w.zipWithIndex.maxBy { case (wi, i) => (wi, -i) }._2
    val selected = scala.collection.mutable.ArrayBuffer(firstIdx)
    val bestSim = Array.tabulate(embs.length)(i => cosSeq(embs(i), embs(firstIdx)))
    while (selected.length < math.min(nlist, embs.length)) {
      val next = embs.indices
        .filterNot(selected.contains)
        .maxBy(i => (w(i) * (1.0 - bestSim(i)) * (1.0 - bestSim(i)), -i))
      selected += next
      embs.indices.foreach { i =>
        val s = cosSeq(embs(i), embs(next))
        if (s > bestSim(i)) bestSim(i) = s
      }
    }
    selected.toSeq.map(embs).zipWithIndex.map(_.swap).toDF("cell", "centroid")
      .select(col("cell"), col("centroid").cast("array<float>").as("centroid"))
  }

  /** Train nlist centroids with a fixed number of Lloyd iterations over a
    * k-means|| initialization.
    */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 2): DataFrame = {
    var centroids = initCentroids(corpus, nlist).cache()
    (0 until iters).foreach { _ =>
      val next = recompute(assign(
        corpus.select(col("vec_id"), col("embedding")), centroids)).cache()
      next.count() // materialize before unpersisting the previous generation
      centroids.unpersist()
      centroids = next
    }
    centroids
  }

  final case class Index(centroids: DataFrame, lists: DataFrame)

  /** Build the inverted lists: every vector tagged with its cell. */
  def build(corpus: DataFrame, nlist: Int, iters: Int = 2): Index = {
    val centroids = train(corpus, nlist, iters)
    val lists = assign(corpus.select(col("vec_id"), col("embedding")), centroids)
      .cache()
    Index(centroids, lists)
  }

  /** Search: rank within the nprobe nearest cells only. `query` must have
    * one row with column `qv`.
    */
  def search(index: Index, query: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = index.centroids.crossJoin(broadcast(query))
      .withColumn("qsim", VectorExprs.cosineSim(col("centroid"), col("qv")))
      .orderBy(col("qsim").desc, col("cell"))
      .limit(nprobe)
      .select(col("cell"))
    index.lists
      .join(broadcast(probed), "cell")
      .crossJoin(broadcast(query))
      .withColumn("cos_sim", VectorExprs.cosineSim(col("embedding"), col("qv")))
      .select(col("vec_id"), col("cell"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF ANN over the embeddings table (rows-only; recall pinned in spec). */
  val qIvf = GraftQuery(
    "q38_ann_ivf",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val idx = build(e, nlist = 16, iters = 2)
      search(idx, q, k = 20, nprobe = 4)
    },
    None)

  val queries: Seq[GraftQuery] = Seq(qIvf)
}
