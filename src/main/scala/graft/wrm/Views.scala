package graft.wrm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 4 analytical views over the enhanced table (S10/P10/W1/O1;
  * reference create_enhanced_views.py:60-95, DDL persisted in
  * db/analytics.duckdb).
  */
object Views {

  val Base = "wrm_stations_enhanced_data"
  val StationsOnly = "wrm_stations_only"
  val BikesOnly = "wrm_bikes_only"
  val Latest = "wrm_stations_latest"

  /** Latest record per station among station-type rows: ROW_NUMBER over
    * (date DESC, file_timestamp DESC) per station_id — with `timestamp
    * DESC` as the deterministic tiebreak both engines agree on
    * (SURVEY §7.4.2).
    */
  def latestPerStation(enhanced: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("station_id"))
      .orderBy(col("date").desc, col("file_timestamp").desc, col("timestamp").desc)
    enhanced
      .filter(col("record_type") === "station")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Register all 4 temp views over an enhanced DataFrame.
    *
    * The reference bakes `ORDER BY date DESC, file_timestamp DESC,
    * station_id` into the base view (create_enhanced_views.py:60-65); an
    * ORDER BY inside a view is presentation-only (SURVEY §4) — we keep the
    * base view unsorted and sort at output edges.
    */
  def register(spark: SparkSession, enhanced: DataFrame): Unit = {
    enhanced.createOrReplaceTempView(Base)
    enhanced.filter(col("record_type") === "station")
      .createOrReplaceTempView(StationsOnly)
    enhanced.filter(col("record_type") === "bike")
      .createOrReplaceTempView(BikesOnly)
    latestPerStation(enhanced).createOrReplaceTempView(Latest)
  }

  /** Register views over a `dt=`-partitioned enhanced parquet root (S9). */
  def registerFromPath(spark: SparkSession, enhancedRoot: String): Unit =
    register(spark, spark.read.option("basePath", enhancedRoot).parquet(enhancedRoot))
}
