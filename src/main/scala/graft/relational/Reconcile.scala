package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-outer reconciliation between a dimension and its fact rollup —
  * the data-quality join that audits BOTH directions at once: entities
  * with no facts, facts with no entity (referential orphans), and the
  * matched mass. The outer-join family's missing member next to the
  * semi/anti pair (q07/q08).
  *
  * Scale shape: the fact side collapses to one row per key BEFORE the
  * join (the shuffle carries key+count, never fact rows), then one
  * full-outer hash join on the key and an O(segments) classification
  * aggregate. Nulls from either side are the signal, not a hazard: the
  * segment of an orphaned fact row is labeled explicitly.
  */
object Reconcile {

  /** Per customer segment: matched/dimension-only/fact-only tallies and
    * the order mass on each side of the match.
    */
  def customerOrderRecon(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perKey = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey"), col("c_mktsegment"))
      .join(perKey, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_mktsegment"), lit("ORPHANED")).as("segment"),
        col("c_custkey"), col("o_custkey"), col("n_orders"))
      .groupBy(col("segment"))
      .agg(
        sum(when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("c_custkey").isNotNull && col("o_custkey").isNull, 1L)
          .otherwise(0L)).as("n_customer_only"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_order_only"),
        sum(coalesce(col("n_orders"), lit(0L))).as("total_orders"))
      .orderBy(col("segment"))
  }

  // ---- queries -------------------------------------------------------------

  val qRecon = GraftQuery(
    "q133_outer_join_recon",
    (s, dir) => customerOrderRecon(Tables.customer(s, dir), Tables.orders(s, dir)),
    Some("""
      WITH per_key AS (
        SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
      SELECT coalesce(c.c_mktsegment, 'ORPHANED') AS segment,
             CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                            AND p.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                            AND p.o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_customer_only,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_order_only,
             CAST(sum(coalesce(p.n_orders, 0)) AS BIGINT) AS total_orders
      FROM customer c FULL OUTER JOIN per_key p ON c.c_custkey = p.o_custkey
      GROUP BY segment ORDER BY segment"""))

  val queries: Seq[GraftQuery] = Seq(qRecon)
}
