package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal-profile reports: the inter-event-time distribution and the
  * weekday×hour activity matrix — the two plots every behavioral
  * dashboard opens with.
  *
  * Scale shapes: the gap histogram's lead window is per-user (the
  * accepted per-key class) and collapses immediately to O(types ×
  * log(max gap)) buckets with integer-only bucket math (the q120
  * power-of-two rule — no float log2). The weekly profile is one
  * groupBy on two derived small-domain keys; counts partial-aggregate
  * map-side, distinct-user counts shuffle (weekday, hour, user) tuples
  * once.
  */
object Temporal {

  private def pow2Bucket(n: String): String =
    s"shiftleft(CAST(1 AS BIGINT), CAST(length(bin($n)) AS INT) - " +
      s"(CASE WHEN ($n & ($n - 1)) = 0 THEN 1 ELSE 0 END))"

  /** Per event type: histogram of seconds-between-consecutive-events (per
    * user), bucketed to the next power of two.
    */
  def gapHistogram(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dt_s",
        expr("(unix_micros(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - unix_micros(ts)) div 1000000"))
      .filter(col("dt_s").isNotNull)
      .select(col("event_type"), expr(pow2Bucket("dt_s")).as("bucket_s"))
      .groupBy(col("event_type"), col("bucket_s"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket_s"))
  }

  /** (weekday 0=Monday, hour, n_events, n_users). */
  def weeklyProfile(events: DataFrame): DataFrame =
    events
      .select(weekday(col("ts")).as("wd"), hour(col("ts")).as("h"),
        col("user_id"))
      .groupBy(col("wd"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("wd"), col("h"))

  // ---- queries -------------------------------------------------------------

  val qGapHistogram = GraftQuery(
    "q144_gap_histogram",
    (s, dir) => gapHistogram(Tables.events(s, dir)),
    Some("""
      WITH led AS (
        SELECT event_type,
               (epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                 - epoch_us(ts)) // 1000000 AS dt_s
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                     event_type FROM events) e),
      b AS (
        SELECT event_type,
               (CAST(1 AS BIGINT) << (length(bin(dt_s)) -
                  CASE WHEN (dt_s & (dt_s - 1)) = 0 THEN 1 ELSE 0 END))
                 AS bucket_s
        FROM led WHERE dt_s IS NOT NULL)
      SELECT event_type, bucket_s, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY event_type, bucket_s
      ORDER BY event_type, bucket_s"""))

  val qWeeklyProfile = GraftQuery(
    "q145_weekly_profile",
    (s, dir) => weeklyProfile(Tables.events(s, dir)),
    Some("""
      SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INT) AS wd,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      GROUP BY wd, h
      ORDER BY wd, h"""))

  val queries: Seq[GraftQuery] = Seq(qGapHistogram, qWeeklyProfile)
}
