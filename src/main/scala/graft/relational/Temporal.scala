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

  /** Anomalous-day screen: per event type, flag days whose event count
    * deviates from the type's median by more than z·MAD — operator
    * COMPOSITION, not new machinery: the daily count table feeds
    * [[Quantiles.madOutlierStats]] unchanged, demonstrating that the
    * robust-stats family composes over derived frames. Everything after
    * the daily aggregate is O(types × days).
    */
  def dailyAnomalies(events: DataFrame, z: Double): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("n_day"))
    Quantiles.madOutlierStats(daily, "event_type", "n_day", z)
  }

  val qDailyAnomalies = GraftQuery(
    "q147_daily_anomalies",
    (s, dir) => dailyAnomalies(Tables.events(s, dir), z = 3.0),
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY event_type, d),
      counts AS (
        SELECT event_type AS grp, v, count(*) AS c
        FROM daily GROUP BY grp, v),
      cum AS (
        SELECT grp, v, c,
               sum(c) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM counts),
      tot AS (SELECT grp, sum(c) AS n FROM counts GROUP BY grp),
      med AS (
        SELECT c.grp, min(c.v) AS med
        FROM cum c JOIN tot t ON c.grp = t.grp
        WHERE c.cum >= ceil(CAST(0.5 AS DECIMAL(2,1)) * t.n) GROUP BY c.grp),
      dcounts AS (
        SELECT k.grp AS grp, abs(k.v - m.med) AS v, sum(k.c) AS c
        FROM counts k JOIN med m ON k.grp = m.grp
        GROUP BY k.grp, abs(k.v - m.med)),
      dcum AS (
        SELECT grp, v, c,
               sum(c) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM dcounts),
      dtot AS (SELECT grp, sum(c) AS n FROM dcounts GROUP BY grp),
      mad AS (
        SELECT d.grp, min(d.v) AS mad
        FROM dcum d JOIN dtot t ON d.grp = t.grp
        WHERE d.cum >= ceil(CAST(0.5 AS DECIMAL(2,1)) * t.n) GROUP BY d.grp)
      SELECT k.grp AS event_type, max(m.med) AS med, max(a.mad) AS mad,
             CAST(sum(k.c) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN abs(k.v - m.med) > a.mad * CAST(3.0 AS DOUBLE)
                           THEN k.c ELSE 0 END) AS BIGINT) AS n_outliers
      FROM counts k
      JOIN med m ON k.grp = m.grp
      JOIN mad a ON k.grp = a.grp
      GROUP BY k.grp ORDER BY event_type"""))

  /** Per-stream freshness report: each event type's last-seen timestamp,
    * its lag behind the freshest stream, and recent volume (events
    * inside the trailing day of the GLOBAL watermark) — the staleness
    * monitor every multi-source ingest dashboard runs. One O(types)
    * aggregate; the global watermark joins back as a 1-row broadcast of
    * a global max (no grouped payload under the hint).
    */
  def freshnessReport(events: DataFrame): DataFrame = {
    val perType = events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("last_seen"))
    val watermark = perType.agg(max(col("last_seen")).as("global_max"))
    val recent = events
      .crossJoin(broadcast(events.agg(max(col("ts")).as("gm"))))
      .filter(col("ts") >= col("gm") - expr("INTERVAL 1 DAY"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_last_day"))
    perType
      .crossJoin(broadcast(watermark))
      .join(recent, Seq("event_type"), "left")
      .select(
        col("event_type"), col("n_events"), col("last_seen"),
        (unix_micros(col("global_max")) - unix_micros(col("last_seen")))
          .as("lag_us"),
        coalesce(col("n_last_day"), lit(0L)).as("n_last_day"))
      .orderBy(col("event_type"))
  }

  val qFreshness = GraftQuery(
    "q182_freshness",
    (s, dir) => freshnessReport(Tables.events(s, dir)),
    Some("""
      WITH per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               max(CAST(ts AS TIMESTAMP)) AS last_seen
        FROM events GROUP BY event_type),
      wm AS (SELECT max(last_seen) AS global_max FROM per_type),
      recent AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_last_day
        FROM events, wm
        WHERE CAST(ts AS TIMESTAMP) >= wm.global_max - INTERVAL 1 DAY
        GROUP BY event_type)
      SELECT p.event_type, p.n_events, p.last_seen,
             CAST(date_diff('microseconds', p.last_seen, w.global_max)
               AS BIGINT) AS lag_us,
             coalesce(r.n_last_day, 0) AS n_last_day
      FROM per_type p
      CROSS JOIN wm w
      LEFT JOIN recent r USING (event_type)
      ORDER BY event_type"""))

  val queries: Seq[GraftQuery] =
    Seq(qGapHistogram, qWeeklyProfile, qDailyAnomalies, qFreshness)
}
