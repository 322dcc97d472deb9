package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hierarchical share-of-total reporting and best-supplier selection —
  * two classic warehouse shapes the registry lacked:
  *
  *  - ratio-to-report at two grouping levels (nation revenue as a share
  *    of its region and of the world): windows run over the O(nations)
  *    AGGREGATE, revenue sums are DECIMAL-exact, and each share divides
  *    two already-exact doubles.
  *  - per-part cheapest supplier (the TPC-H Q2 shape on the observed
  *    line prices): min-per-group + equality join back, expressed as a
  *    rank window over the per-(part, supplier) aggregate with a
  *    deterministic supplier tie-break.
  */
object ShareReport {

  /** (region, nation, revenue, region_share, global_share). */
  def nationShares(lineitem: DataFrame, supplier: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame = {
    val rev = lineitem
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(region.select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
    val wr = Window.partitionBy(col("r_name"))
    val wg = Window.partitionBy()
    rev.select(col("r_name"), col("n_name"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") /
          sum(col("rev")).over(wr).cast("double")).as("region_share"),
        (col("rev").cast("double") /
          sum(col("rev")).over(wg).cast("double")).as("global_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Per part: the supplier with the lowest observed average unit price
    * (ties broken on supplier key), with that price.
    *
    * The rn=1 rank window this used through r15 is an ARGMIN — expressed
    * as `min(struct(unit_price, suppkey))` it becomes an aggregate whose
    * partial combine collapses each partition to one row per part BEFORE
    * the exchange, where the window had to sort and ship the full
    * (part, supplier) table (r16 StageProfile: the window+sort stages
    * were ~2 s of the 14.5 s sf10 run, and at 100 TB a whole-table sort
    * exchange vs an n-parts one). The struct's lexicographic order is
    * exactly the window's (unit_price ASC, suppkey ASC) — ties, NULLs
    * (first) and NaNs (last) included — so the result is bit-identical.
    */
  def cheapestSupplier(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
          .as("unit_price"))
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("unit_price"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"), col("m.l_suppkey").as("best_suppkey"),
        col("m.unit_price").as("unit_price"))
      .orderBy(col("l_partkey"))

  // ---- queries -------------------------------------------------------------

  val qNationShares = GraftQuery(
    "q142_nation_shares",
    (s, dir) => nationShares(Tables.lineitem(s, dir), Tables.supplier(s, dir),
      Tables.nation(s, dir), Tables.region(s, dir)),
    Some("""
      WITH rev AS (
        SELECT r.r_name, n.n_name,
               sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name)
      SELECT r_name, n_name,
             CAST(rev AS DOUBLE) AS revenue,
             CAST(rev AS DOUBLE) /
               CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE)
               AS region_share,
             CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE)
               AS global_share
      FROM rev
      ORDER BY r_name, n_name"""))

  val qCheapestSupplier = GraftQuery(
    "q143_cheapest_supplier",
    (s, dir) => cheapestSupplier(Tables.lineitem(s, dir)),
    Some("""
      WITH unit AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) /
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS unit_price
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT l_partkey, l_suppkey AS best_suppkey, unit_price
      FROM unit
      QUALIFY row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY unit_price, l_suppkey) = 1
      ORDER BY l_partkey"""))

  val queries: Seq[GraftQuery] = Seq(qNationShares, qCheapestSupplier)
}
