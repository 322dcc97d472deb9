package graft.wrm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dt=-partitioned parquet sinks (S8/S11; reference enhanced_all.py:113-127,
  * iceberg_assets.py:18-49).
  *
  * The Hive `dt=YYYY-MM-DD` layout is preserved so partition pruning works
  * on read — at scale, a date-filtered query touches only its partitions.
  */
object Sinks {

  /** Append an enhanced frame under `root/dt=<date>/`. Idempotent re-runs
    * of one date should use overwriteDate (the reference recomputes a whole
    * date partition on late files — SURVEY §2.9 T4).
    */
  def appendEnhanced(enhanced: DataFrame, root: String): Unit =
    enhanced
      .withColumn("dt", date_format(col("date"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("dt").parquet(root)

  /** Idempotent full overwrite of one date partition (T4 late-data path).
    * Dynamic partition overwrite replaces ONLY the partitions present in
    * the frame — other dates are untouched.
    */
  def overwriteDate(enhanced: DataFrame, root: String): Unit =
    enhanced
      .withColumn("dt", date_format(col("date"), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt").parquet(root)

  /** S11: iceberg-style analytical table sink — adds partition_date and
    * writes partitioned (plain parquet carries the capability; swap for a
    * real Iceberg catalog on a cluster).
    */
  def icebergStyle(df: DataFrame, root: String, partitionDate: String): Unit =
    df.withColumn("partition_date", lit(partitionDate).cast("timestamp"))
      .write.mode("append").partitionBy("partition_date").parquet(root)
}
