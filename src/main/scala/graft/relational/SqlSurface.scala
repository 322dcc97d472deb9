package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANSI-SQL entry point exercised as a first-class surface: a
  * correlated scalar subquery handed to `spark.sql` verbatim. Catalyst
  * DECORRELATES it — the per-row subquery becomes one grouped aggregate
  * joined back on the correlation key, so the plan is the same
  * aggregate+join a hand-written DataFrame version would produce, not
  * O(rows) subquery executions (the RewriteCorrelatedScalarSubquery rule).
  *
  * Determinism: the compared average accumulates as DECIMAL and converts
  * to DOUBLE once (the [[graft.GraftQuery.DEC]] idiom), so the `>`
  * comparison sees identical values in both engines whatever the
  * partitioning.
  */
object SqlSurface {

  /** Parts priced strictly above their brand's average retail price,
    * counted per brand. The brand average arrives via a correlated scalar
    * subquery — the textbook shape users port from warehouse SQL.
    */
  def aboveBrandAverage(parts: DataFrame): DataFrame = {
    val spark = parts.sparkSession
    // session-scoped name, distinct from the wrm view family
    parts.createOrReplaceTempView("graft_part_sql")
    spark.sql("""
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_above
      FROM graft_part_sql p
      WHERE p_retailprice > (
        SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*)
        FROM graft_part_sql p2
        WHERE p2.p_brand = p.p_brand)
      GROUP BY p_brand
      ORDER BY p_brand""")
  }

  // ---- queries -------------------------------------------------------------

  val qCorrelated = GraftQuery(
    "q124_correlated_subquery",
    (s, dir) => aboveBrandAverage(Tables.part(s, dir)),
    Some("""
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_above
      FROM part p
      WHERE p_retailprice > (
        SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*)
        FROM part p2
        WHERE p2.p_brand = p.p_brand)
      GROUP BY p_brand
      ORDER BY p_brand"""))

  val queries: Seq[GraftQuery] = Seq(qCorrelated)
}
