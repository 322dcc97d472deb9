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

  /** Train nlist centroids with a fixed number of Lloyd iterations. */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 2): DataFrame = {
    var centroids = corpus
      .orderBy(col("vec_id")).limit(nlist)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
        .as("cell"), col("embedding").as("centroid"))
    centroids = centroids.cache()
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
