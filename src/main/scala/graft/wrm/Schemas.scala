package graft.wrm

import org.apache.spark.sql.types._

/** Fixed, declared schemas for the WRM station pipeline.
  *
  * Mirrors the reference's Pandera schemas
  * (wrm_pipeline/models/stations.py:10-31 processed, :39-60 enhanced):
  * strict column ORDER, explicit types, per-column checks. Timestamps are
  * µs-precision wall-clock (session tz UTC) per SURVEY §7.4.1.
  */
object Schemas {

  /** Raw CSV columns as they arrive from the API payload (13 string cols;
    * column 2 is the composite `ts|gmt_local|gmt_server`).
    */
  val rawColumns: Seq[String] = Seq(
    "station_id", "composite_ts", "name", "lat", "lon", "bikes", "spaces",
    "installed", "locked", "temporary", "total_docks",
    "givesbonus_acceptspedelecs_fbbattlevel", "pedelecs")

  val rawSchema: StructType =
    StructType(rawColumns.map(c => StructField(c, StringType, nullable = true)))

  /** Processed table: 17 ordered columns (models/stations.py:10-31). */
  val processedColumns: Seq[String] = Seq(
    "station_id", "name", "timestamp", "gmt_local_diff_sec",
    "gmt_servertime_diff_sec", "lat", "lon", "bikes", "spaces", "installed",
    "locked", "temporary", "total_docks",
    "givesbonus_acceptspedelecs_fbbattlevel", "pedelecs",
    "s3_source_key", "file_timestamp")

  val processedSchema: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("gmt_local_diff_sec", LongType, nullable = false),
    StructField("gmt_servertime_diff_sec", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("bikes", LongType, nullable = false),
    StructField("spaces", LongType, nullable = false),
    StructField("installed", BooleanType, nullable = false),
    StructField("locked", BooleanType, nullable = false),
    StructField("temporary", BooleanType, nullable = false),
    StructField("total_docks", LongType, nullable = false),
    StructField("givesbonus_acceptspedelecs_fbbattlevel", BooleanType, nullable = false),
    StructField("pedelecs", LongType, nullable = false),
    StructField("s3_source_key", StringType, nullable = false),
    StructField("file_timestamp", TimestampType, nullable = false)))

  /** Enhanced table: processed + record_type, date, processed_at — 20
    * ordered columns (models/stations.py:39-60, order enhanced_all.py:77-84).
    */
  val enhancedColumns: Seq[String] =
    processedColumns.slice(0, 15) ++ Seq("record_type") ++
      processedColumns.slice(15, 17) ++ Seq("date", "processed_at")

  val recordTypes: Seq[String] = Seq("station", "bike", "unknown")
}

/** Typed row models where compile-time column safety helps. */
final case class ProcessedRecord(
    station_id: String, name: String, timestamp: java.sql.Timestamp,
    gmt_local_diff_sec: Long, gmt_servertime_diff_sec: Long,
    lat: Double, lon: Double, bikes: Long, spaces: Long,
    installed: Boolean, locked: Boolean, temporary: Boolean,
    total_docks: Long, givesbonus_acceptspedelecs_fbbattlevel: Boolean,
    pedelecs: Long, s3_source_key: String, file_timestamp: java.sql.Timestamp)
