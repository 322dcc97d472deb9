package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic product-analytics operators over the event stream: strict
  * sequential funnels and weekly cohort retention. Both are pure
  * aggregate/join pipelines — the shuffles carry (user_id, ts) scalars and
  * the intermediate tables are O(users), never O(events), so the shapes
  * hold at any event volume.
  */
object Funnels {

  /** Strict-order funnel: first `s1`, then the first `s2` AFTER it, then
    * the first `s3` after that. Per user: the three timestamps (null once
    * the chain breaks) and the stage reached (0-3). Three aggregate+join
    * stages — the sequential dependency needs the previous stage's
    * timestamp, and each stage's output is one row per user.
    */
  def funnel3(events: DataFrame, s1: String, s2: String, s3: String): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === s1)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts1"))
    val t2 = e.join(t1, Seq("user_id"))
      .filter(col("event_type") === s2 && col("ts") > col("ts1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
    val t3 = e.join(t2, Seq("user_id"))
      .filter(col("event_type") === s3 && col("ts") > col("ts2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("ts1"), col("ts2"), col("ts3"),
        when(col("ts3").isNotNull, 3)
          .when(col("ts2").isNotNull, 2)
          .otherwise(1).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Weekly cohort retention: users bucketed by the week of their first
    * event; per (cohort week, week offset) the number of cohort members
    * active that week. The distinct pass collapses events to (user, week)
    * BEFORE the counting aggregate.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firsts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active.join(firsts, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Telemetry gap detection: per-entity silences longer than `thresholdUs`
    * (sensor dropouts, churn windows). One lag window PARTITIONED by the
    * entity — per-partition work is that entity's event count, the same
    * accepted bound as every per-key window in the engine. Gap width is
    * exact integer microseconds.
    */
  def eventGaps(events: DataFrame, thresholdUs: Long): DataFrame = {
    require(thresholdUs > 0, s"thresholdUs must be > 0, got $thresholdUs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev")) > thresholdUs)
      .select(col("user_id"), col("prev").as("gap_start"), col("ts").as("gap_end"),
        (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap_us"))
      .orderBy(col("user_id"), col("gap_start"))
  }

  // ---- queries -------------------------------------------------------------

  val qFunnel = GraftQuery(
    "q85_funnel",
    (s, dir) => funnel3(Tables.events(s, dir), "view", "click", "purchase"),
    Some("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      t1 AS (SELECT user_id, min(ts) AS ts1 FROM e WHERE event_type = 'view'
             GROUP BY user_id),
      t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM e JOIN t1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM e JOIN t2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id)
      SELECT t1.user_id, t1.ts1, t2.ts2, t3.ts3,
             CASE WHEN t3.ts3 IS NOT NULL THEN 3
                  WHEN t2.ts2 IS NOT NULL THEN 2 ELSE 1 END AS stage
      FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
      ORDER BY user_id"""))

  val qCohort = GraftQuery(
    "q86_cohort_retention",
    (s, dir) => cohortRetention(Tables.events(s, dir)),
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      firsts AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
                 FROM e GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM e)
      SELECT f.cohort_week,
             CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                            CAST(a.week AS DATE)) / 7 AS INTEGER) AS week_offset,
             count(*) AS n_users
      FROM active a JOIN firsts f USING (user_id)
      GROUP BY f.cohort_week, week_offset
      ORDER BY f.cohort_week, week_offset"""))

  val qGaps = GraftQuery(
    "q89_event_gaps",
    (s, dir) => eventGaps(Tables.events(s, dir), thresholdUs = 86400000000L),
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      l AS (SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM e)
      SELECT user_id, prev AS gap_start, ts AS gap_end,
             epoch_us(ts) - epoch_us(prev) AS gap_us
      FROM l
      WHERE prev IS NOT NULL AND epoch_us(ts) - epoch_us(prev) > 86400000000
      ORDER BY user_id, gap_start"""))

  val queries: Seq[GraftQuery] = Seq(qFunnel, qCohort, qGaps)
}
