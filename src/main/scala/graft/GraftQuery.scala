package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the same
  * parquet tables. Oracle-less queries get the driver's weaker rows-only
  * check.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object GraftQuery {
  /** Exact-sum idiom used throughout the oracles: accumulate money-like
    * doubles as DECIMAL(18,2) (exact, order-independent) and convert to
    * DOUBLE only at the end, so Spark and DuckDB produce bit-identical
    * results regardless of row order / partitioning.
    */
  val DEC = "DECIMAL(18,2)"

  /** Engine-independent half-up quantizer to `digits` decimals:
    * `floor(x·10ⁿ + 0.5) / 10ⁿ` in pure double arithmetic — NOT
    * `round(x, n)`, whose Spark implementation rounds the double's
    * SHORTEST decimal repr (BigDecimal.valueOf) while DuckDB rounds in
    * double arithmetic; on boundary-adjacent ratios the two legitimately
    * disagree by a whole quantum (the q132 TWAP post-mortem). Pair every
    * use with [[duckQz]] in the oracle.
    */
  def qz(c: org.apache.spark.sql.Column, digits: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10.0, digits)
    org.apache.spark.sql.functions.floor(c * p + org.apache.spark.sql.functions.lit(0.5))
      .cast("double") / p
  }

  /** DuckDB mirror of [[qz]]. */
  def duckQz(expr: String, digits: Int): String = {
    val p = "1" + "0" * digits
    s"floor(($expr) * $p.0 + 0.5) / $p.0"
  }
}
