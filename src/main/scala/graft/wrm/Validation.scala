package graft.wrm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema validation operator (P13): declarative per-column constraint
  * checks with all-failures-collected reporting, mirroring the reference's
  * Pandera validation (models/stations.py checks; lazy=True collection at
  * enhanced_all.py:86-101; abort-on-failure at processed_all.py:231-239).
  *
  * One aggregate pass computes every violation count (no per-check scans) —
  * at 100 TB this is a single map-side-combinable job over the table.
  */
object Validation {

  final case class Check(name: String, predicate: Column)

  final class SchemaValidationException(
      val failures: Seq[(String, Long)], msg: String)
    extends RuntimeException(msg)

  /** Checks for the processed table (models/stations.py:10-31). */
  def processedChecks: Seq[Check] = Seq(
    Check("station_id_not_null", col("station_id").isNotNull),
    Check("name_not_null", col("name").isNotNull),
    Check("timestamp_not_null", col("timestamp").isNotNull),
    Check("lat_not_null", col("lat").isNotNull),
    Check("lon_not_null", col("lon").isNotNull),
    Check("bikes_ge_0", col("bikes") >= 0),
    Check("spaces_ge_0", col("spaces") >= 0),
    Check("total_docks_ge_1", col("total_docks") >= 1),
    Check("pedelecs_ge_0", col("pedelecs") >= 0))

  /** Checks for the enhanced table (models/stations.py:39-60). */
  def enhancedChecks: Seq[Check] = processedChecks ++ Seq(
    Check("record_type_in_domain",
      col("record_type").isin(Schemas.recordTypes: _*)),
    Check("date_not_null", col("date").isNotNull),
    Check("processed_at_not_null", col("processed_at").isNotNull))

  /** Count violations for every check in ONE aggregate pass; null predicate
    * results (null input to a comparison) count as violations, like
    * Pandera's nullable=False + checks.
    */
  def violationCounts(df: DataFrame, checks: Seq[Check]): Seq[(String, Long)] = {
    val aggs = checks.map(c =>
      sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L)).as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.zipWithIndex.map { case (c, i) =>
      c.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }
  }

  /** Validate; throws SchemaValidationException listing every failing check
    * (lazy collection) — or returns the frame for fluent chaining.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val failures = violationCounts(df, checks).filter(_._2 > 0)
    if (failures.nonEmpty)
      throw new SchemaValidationException(
        failures,
        "Schema validation failed: " +
          failures.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
    df
  }

  /** Column-order assertion (`ordered=True`, models/stations.py:31,60):
    * the expected columns must appear as a prefix in order; extra columns
    * are tolerated (`strict=False`).
    */
  def assertColumnOrder(df: DataFrame, expected: Seq[String]): DataFrame = {
    val actual = df.columns.take(expected.length).toSeq
    if (actual != expected)
      throw new SchemaValidationException(
        Seq(("column_order", 1L)),
        s"Column order mismatch: expected $expected, got $actual")
    df
  }
}
