package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Penny-exact proration: allocate each order's header total across its
  * line items proportionally to extended price, with largest-remainder
  * rounding so the allocations sum EXACTLY to the header total — the
  * standard finance/billing allocation no naive `total * share` float
  * division gets right.
  *
  * All arithmetic is integer cents: base share is the floored integer
  * product `target * ext / total`, and the `target - Σbase` leftover
  * cents (provably 0 ≤ leftover < n_lines) go one each to the lines with
  * the largest division remainders (ties broken by line number). Integer
  * ops are exact and order-independent, so Spark and the oracle agree
  * bit-for-bit — no float rounding anywhere.
  *
  * Scale shape: one shuffle on the order key; both windows and the
  * grouped sum run inside each order's handful of lines. Products stay
  * under 2^63 (cents ~1e7 × 1e7 = 1e14).
  */
object Proration {

  /** (l_orderkey, l_linenumber, ext_cents, alloc_cents): each line's
    * exact-cent allocation of the order's `o_totalprice`. Amounts must be
    * positive (integer `div`/`%` truncate toward zero; floor == truncate
    * only for non-negative operands — both engines agree there).
    */
  def prorate(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("ext_cents"))
    val target = orders.select(
      col("o_orderkey").as("l_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("target_cents"))
    val w = Window.partitionBy(col("l_orderkey"))
    li.join(target, Seq("l_orderkey"))
      .withColumn("total_cents", sum(col("ext_cents")).over(w))
      .withColumn("base",
        expr("(target_cents * ext_cents) div total_cents"))
      .withColumn("rem",
        (col("target_cents") * col("ext_cents")) % col("total_cents"))
      .withColumn("rk", row_number().over(
        w.orderBy(col("rem").desc, col("l_linenumber"))))
      .withColumn("leftover",
        col("target_cents") - sum(col("base")).over(w))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("ext_cents"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc_cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // ---- queries -------------------------------------------------------------

  val qProrate = GraftQuery(
    "q159_proration",
    (s, dir) => prorate(Tables.orders(s, dir), Tables.lineitem(s, dir)),
    Some("""
      WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_cents
        FROM lineitem),
      t AS (
        SELECT o_orderkey AS l_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS target_cents
        FROM orders),
      j AS (
        SELECT li.*, t.target_cents,
               sum(ext_cents) OVER (PARTITION BY li.l_orderkey) AS total_cents
        FROM li JOIN t USING (l_orderkey)),
      shares AS (
        SELECT l_orderkey, l_linenumber, ext_cents, target_cents,
               (target_cents * ext_cents) // total_cents AS base,
               (target_cents * ext_cents) % total_cents AS rem
        FROM j),
      ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY rem DESC, l_linenumber) AS rk,
               target_cents
                 - sum(base) OVER (PARTITION BY l_orderkey) AS leftover
        FROM shares)
      SELECT l_orderkey, l_linenumber, ext_cents,
             CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_cents
      FROM ranked
      ORDER BY l_orderkey, l_linenumber"""))

  val queries: Seq[GraftQuery] = Seq(qProrate)
}
