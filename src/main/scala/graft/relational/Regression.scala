package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group simple linear regression (OLS y = a·x + b) from sufficient
  * statistics — slope, intercept and R² computed from one pass of exact
  * sums, the way a distributed engine fits millions of tiny per-key
  * models without ever materializing per-group vectors.
  *
  * Scale shape: ONE map-side-combinable aggregate over the fact table
  * produces the five sufficient statistics per group (n, Σx, Σy, Σx²,
  * Σxy, Σy²); the closed-form solve is O(groups) arithmetic on the
  * aggregated rows. No window, no second scan, no per-group collect.
  *
  * Determinism: float sums are partitioning-order-dependent, so the sums
  * accumulate as DECIMAL(18,2) products (exact, order-independent — the
  * [[graft.GraftQuery.DEC]] idiom) and convert to DOUBLE only inside the
  * closed-form expressions, which both engines then evaluate on identical
  * inputs with an identical operation tree.
  */
object Regression {

  /** Per `groupCol`: n, slope, intercept, r2 of `yCol` regressed on
    * `xCol`.
    */
  def groupRegression(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val xd = col(xCol).cast("decimal(18,2)")
    val yd = col(yCol).cast("decimal(18,2)")
    val stats = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum(xd * xd).as("sxx"), sum(xd * yd).as("sxy"),
        sum(yd * yd).as("syy"))
    val nd = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    // vxy/vxx/vyy (n·cov, n·var scaled by n — the common factor cancels
    // in slope and r2) are computed in EXACT decimal and rounded to the
    // integer before the double cast. Casting the raw scale-4 moments
    // (syy ≈ 5e12 → int repr 5e16 > 2^53) lets DuckDB's two-step
    // decimal→double (int128→double, then ÷10⁴) double-round where
    // Spark's BigDecimal cast rounds once — a last-ulp r2 mismatch that
    // sf0.001 actually hit; an integer decimal casts in ONE rounding in
    // both engines, and the dropped sub-unit is ~1e-19 relative.
    val ndec = col("n").cast(DecimalType(20, 0))
    def exactDiff(prod: Column, a: Column, b: Column): Column =
      round(ndec * prod - a * b, 0).cast(DecimalType(38, 0)).cast("double")
    val vxy = exactDiff(col("sxy"), col("sx"), col("sy"))
    val vxx = exactDiff(col("sxx"), col("sx"), col("sx"))
    val vyy = exactDiff(col("syy"), col("sy"), col("sy"))
    // degenerate-group guards (oracle mirrors with CASE): a constant-x
    // group — any single-row group included — has vxx = 0 and no defined
    // fit; a constant-y group has vyy = 0 and no defined r². NULL, not a
    // divide-by-zero abort: at scale some group WILL be degenerate.
    val slope = when(vxx === 0.0, lit(null).cast("double"))
      .otherwise(vxy / vxx)
    stats.select(col(groupCol), col("n"),
      slope.as("slope"),
      ((d("sy") - slope * d("sx")) / nd).as("intercept"),
      when(vxx === 0.0 || vyy === 0.0, lit(null).cast("double"))
        .otherwise((vxy * vxy) / (vxx * vyy)).as("r2"))
      .orderBy(col(groupCol))
  }

  // ---- queries -------------------------------------------------------------

  /** q121: price-on-quantity fit per return flag — the oracle computes the
    * identical sufficient statistics with the identical DECIMAL
    * accumulation and the identical double-arithmetic solve.
    */
  val qRegression = GraftQuery(
    "q121_group_regression",
    (s, dir) => groupRegression(Tables.lineitem(s, dir),
      "l_returnflag", "l_quantity", "l_extendedprice"),
    Some("""
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               sum(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               sum(CAST(l_quantity AS DECIMAL(18,2)) *
                   CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem GROUP BY l_returnflag),
      v AS (
        -- exact-decimal moment differences rounded to the integer, so
        -- the double cast is a single rounding (see the Spark-side note)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               CAST(CAST(round(CAST(n AS DECIMAL(10,0))
                            * CAST(sxy AS DECIMAL(28,4))
                          - CAST(sx AS DECIMAL(19,2))
                            * CAST(sy AS DECIMAL(19,2)), 0)
                 AS DECIMAL(38,0)) AS DOUBLE) AS vxy,
               CAST(CAST(round(CAST(n AS DECIMAL(10,0))
                            * CAST(sxx AS DECIMAL(28,4))
                          - CAST(sx AS DECIMAL(19,2))
                            * CAST(sx AS DECIMAL(19,2)), 0)
                 AS DECIMAL(38,0)) AS DOUBLE) AS vxx,
               CAST(CAST(round(CAST(n AS DECIMAL(10,0))
                            * CAST(syy AS DECIMAL(28,4))
                          - CAST(sy AS DECIMAL(19,2))
                            * CAST(sy AS DECIMAL(19,2)), 0)
                 AS DECIMAL(38,0)) AS DOUBLE) AS vyy
        FROM s)
      SELECT l_returnflag, n,
             CASE WHEN vxx = 0 THEN NULL ELSE vxy / vxx END AS slope,
             CASE WHEN vxx = 0 THEN NULL
                  ELSE (sy - vxy / vxx * sx) / nd END AS intercept,
             CASE WHEN vxx = 0 OR vyy = 0 THEN NULL
                  ELSE (vxy * vxy) / (vxx * vyy) END AS r2
      FROM v ORDER BY l_returnflag"""))

  val queries: Seq[GraftQuery] = Seq(qRegression)
}
