package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // numerators/denominators of the closed form; vxy/vxx/vyy are n·cov
    // and n·var scaled by n — the common factor cancels in slope and r2
    val vxy = nd * d("sxy") - d("sx") * d("sy")
    val vxx = nd * d("sxx") - d("sx") * d("sx")
    val vyy = nd * d("syy") - d("sy") * d("sy")
    val slope = vxy / vxx
    stats.select(col(groupCol), col("n"),
      slope.as("slope"),
      ((d("sy") - slope * d("sx")) / nd).as("intercept"),
      ((vxy * vxy) / (vxx * vyy)).as("r2"))
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
      d AS (
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               CAST(sxx AS DOUBLE) AS sxx, CAST(sxy AS DOUBLE) AS sxy,
               CAST(syy AS DOUBLE) AS syy
        FROM s)
      SELECT l_returnflag, n,
             (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope,
             (sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx) / nd
               AS intercept,
             ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) /
               ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
      FROM d ORDER BY l_returnflag"""))

  val queries: Seq[GraftQuery] = Seq(qRegression)
}
