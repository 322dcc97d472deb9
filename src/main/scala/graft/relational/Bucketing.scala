package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed (pre-shuffled) table layout + co-located join: the Spark-native
  * answer to "this fact-fact join shuffles 100 TB every night". Both fact
  * tables are written ONCE with `bucketBy(N, joinKey)` + in-bucket sort;
  * every later equi-join on that key reads bucket i against bucket i — a
  * sort-merge join with NO exchange on either side (and no per-task sort
  * when the in-bucket sort is declared). At cluster scale the nightly
  * shuffle disappears; locally the spec pins the plan shape (zero
  * ShuffleExchange under the join with broadcast disabled).
  *
  * The bucketed copies live in the session catalog (bucket metadata is
  * catalog metadata — a bare parquet directory loses it), keyed by source
  * dir, built lazily once per session: the q38_ivf_build pattern of a
  * persisted index/layout surface with query-time probes.
  */
object Bucketing {

  /** Bucket-count sizing: a fixed count is a scale trap — 8 buckets that
    * co-locate a 60 MB join pin the same join to 8 tasks at 100× data and
    * to 8 monster files at 100 TB (measured: the sf10 bucketed-scan join
    * stage ran 8 tasks × ~10 s on 32 idle cores). Buckets are derived from
    * the larger fact's INPUT BYTES (target ~256 MB per bucket — the
    * layout knob that matters at cluster scale) and floored at the
    * writer's parallelism (the knob that matters on a small box), rounded
    * up to a power of two and clamped to [8, 4096] (file-count sanity).
    */
  val MinBuckets = 8
  val MaxBuckets = 4096
  val TargetBucketBytes: Long = 256L << 20

  def numBucketsFor(spark: SparkSession, sfDir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(s"$sfDir/lineitem.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      try fs.getContentSummary(path).getLength
      catch { case _: java.io.IOException => 0L }
    val need = math.max(bytes / TargetBucketBytes + 1,
      spark.sparkContext.defaultParallelism.toLong)
    var n = MinBuckets
    while (n < need && n < MaxBuckets) n <<= 1
    n
  }

  private def tag(sfDir: String): String =
    java.lang.Integer.toHexString(sfDir.hashCode)

  /** Ensure bucketed copies of orders/lineitem exist for `sfDir`; returns
    * their catalog table names. Idempotent per session (and cheap to probe:
    * one catalog lookup).
    */
  def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = {
    val t = tag(sfDir)
    val (ordT, liT) = (s"graft_orders_bkt_$t", s"graft_lineitem_bkt_$t")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$t"
    // both sides MUST share one bucket count (sized off the larger fact)
    // or the co-located join degrades to a shuffle on the smaller side.
    // Compute it unconditionally and verify any PRE-EXISTING table carries
    // this exact count: a partial prior run (one table written, then the
    // session died) would otherwise pair a stale count with a fresh one
    // and silently degrade the join back to a shuffle.
    val buckets = numBucketsFor(spark, sfDir)
    def existingBuckets(name: String): Option[Int] =
      if (!spark.catalog.tableExists(name)) None
      else spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .bucketSpec.map(_.numBuckets)
    val stale = Seq(ordT, liT).exists(n =>
      spark.catalog.tableExists(n) && !existingBuckets(n).contains(buckets))
    if (stale) Seq(ordT, liT).foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    if (!spark.catalog.tableExists(ordT)) {
      Tables.orders(spark, sfDir).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ordT)
    }
    if (!spark.catalog.tableExists(liT)) {
      Tables.lineitem(spark, sfDir).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").mode("overwrite").saveAsTable(liT)
    }
    (ordT, liT)
  }

  /** The co-located fact-fact join itself (pre-aggregation), for plan
    * inspection: with broadcast disabled this must plan as a sort-merge
    * join whose both sides are bucket scans — no exchange anywhere below.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (ordT, liT) = ensureBucketed(spark, sfDir)
    spark.table(ordT).join(spark.table(liT),
      col("o_orderkey") === col("l_orderkey"))
  }

  /** Revenue by order priority over the bucketed join — byte-identical to
    * the same query over the raw tables (bucketing is layout, not
    * semantics), which is exactly what the oracle checks.
    */
  def revenueByPriority(spark: SparkSession, sfDir: String): DataFrame =
    bucketedJoin(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))

  // ---- queries -------------------------------------------------------------

  val qBucketedJoin = GraftQuery(
    "q155_bucketed_join",
    (s, dir) => revenueByPriority(s, dir),
    Some("""
      SELECT o.o_orderpriority,
             count(*) AS n_items,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS revenue
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority"""))

  val queries: Seq[GraftQuery] = Seq(qBucketedJoin)
}
