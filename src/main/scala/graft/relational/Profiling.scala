package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass-per-column data profiling: row count, null count, exact
  * distinct count, min/max per numeric column — the ingest-time
  * profile every pipeline records before trusting a new table.
  *
  * Scale shape: one single-column aggregate per profiled column (the
  * parquet scan prunes to exactly that column — a multi-count-distinct
  * in ONE aggregate would Expand the scan n_cols×, shuffling every
  * column's values together; per-column scans shuffle each column
  * once), unioned into the O(columns) report.
  */
object Profiling {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.map { c =>
      // n_null counts nulls of the RAW column (the oracle's `c IS NULL`
      // contract) — counting after the numeric cast would also count
      // cast failures (e.g. profiled strings) as nulls
      df.select(col(c).isNull.as("raw_null"), col(c).cast("double").as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("raw_null"), 1L).otherwise(0L)).as("n_null"),
          count_distinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionAll _).orderBy(col("column"))
  }

  // ---- queries -------------------------------------------------------------

  private val Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val qProfile = GraftQuery(
    "q178_column_profile",
    (s, dir) => profile(Tables.lineitem(s, dir), Cols),
    Some(Cols.map { c =>
      s"""
      SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             CAST(count(DISTINCT CAST($c AS DOUBLE)) AS BIGINT)
               AS n_distinct,
             min(CAST($c AS DOUBLE)) AS min_v,
             max(CAST($c AS DOUBLE)) AS max_v
      FROM lineitem"""
    }.mkString("", "\nUNION ALL", "\nORDER BY \"column\"")))

  val queries: Seq[GraftQuery] = Seq(qProfile)
}
