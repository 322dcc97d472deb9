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
}
