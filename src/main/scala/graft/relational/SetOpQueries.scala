package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Set operations and grouping sets — completing the §2.7 surface with
  * the Spark built-ins the reference would get for free.
  */
object SetOpQueries {

  /** q43: INTERSECT / EXCEPT — nations that have suppliers vs customers. */
  val q43 = GraftQuery(
    "q43_intersect_except",
    (s, dir) => {
      val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
      val cus = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      val both = sup.intersect(cus).withColumn("set_op", lit("both"))
      val supOnly = sup.except(cus).withColumn("set_op", lit("supplier_only"))
      val cusOnly = cus.except(sup).withColumn("set_op", lit("customer_only"))
      both.unionByName(supOnly).unionByName(cusOnly)
        .orderBy(col("set_op"), col("nk"))
    },
    Some("""
      SELECT nk, set_op FROM (
        SELECT nk, 'both' AS set_op FROM
          (SELECT s_nationkey AS nk FROM supplier INTERSECT SELECT c_nationkey FROM customer)
        UNION ALL
        SELECT nk, 'supplier_only' FROM
          (SELECT s_nationkey AS nk FROM supplier EXCEPT SELECT c_nationkey FROM customer)
        UNION ALL
        SELECT nk, 'customer_only' FROM
          (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      ) t ORDER BY set_op, nk"""))

  /** q44: CUBE over two dimensions with exact sums. */
  val q44 = GraftQuery(
    "q44_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  val all: Seq[GraftQuery] = Seq(q43, q44)
}
