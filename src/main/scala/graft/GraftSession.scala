package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Sized for the test harness (local[32], single JVM) but every setting is
  * cluster-safe: shuffle partitions are overridable, AQE handles runtime
  * re-planning (skew joins, partition coalescing) on a real cluster.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as epoch-nano longs and
      // convert to micros in Tables.events (truncation — same as DuckDB's
      // TIMESTAMP_NS -> TIMESTAMP cast, so oracles agree).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
