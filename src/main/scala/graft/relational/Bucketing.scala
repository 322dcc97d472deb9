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

  val NumBuckets = 8

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
    if (!spark.catalog.tableExists(ordT)) {
      Tables.orders(spark, sfDir).write
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ordT)
    }
    if (!spark.catalog.tableExists(liT)) {
      Tables.lineitem(spark, sfDir).write
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
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
