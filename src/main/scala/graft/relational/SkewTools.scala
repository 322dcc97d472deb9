package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-stage salted aggregation.
  *
  * A single hot key sends its entire traffic to one reducer; salting
  * splits each key into `salts` sub-keys for the partial aggregate, then
  * combines the partials in a second (tiny) aggregate. Works for any
  * algebraic aggregate (sum/count/min/max — anything with a combine step).
  * AQE's skew handling covers joins; aggregation skew needs this shape.
  */
object SkewTools {

  final case class AggSpec(partial: Column => Column, combine: Column => Column)

  /** Salted sum/count aggregation over `key`:
    * stage 1 groups by (key, salt) — parallelism `salts` per hot key;
    * stage 2 groups by key over ≤ salts partial rows per key.
    */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
}
