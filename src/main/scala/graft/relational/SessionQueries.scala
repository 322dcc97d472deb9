package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Sessionization, per-group top-N, and pivot — the remaining classic
  * analytics shapes, each DuckDB-oracle-checked.
  */
object SessionQueries {

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q40: gap-based sessionization (30-minute inactivity boundary) via
    * lag + cumulative boundary count — the standard window formulation;
    * the streaming dual would be GroupStateTimeout.EventTimeTimeout.
    */
  val q40 = GraftQuery(
    "q40_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("boundary",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum(col("boundary")).over(wRun))
        .groupBy(col("user_id"), col("session_no"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(d2(col("value"))).cast("double").as("session_value"))
        .orderBy(col("user_id"), col("session_no"))
    },
    Some("""
      SELECT user_id, session_no,
             count(*) AS n_events,
             min(ts_us) AS session_start,
             max(ts_us) AS session_end,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM (
        SELECT user_id, value, ts_us,
               CAST(sum(boundary) OVER (PARTITION BY user_id
                 ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM (
          SELECT user_id, event_id, value,
                 CAST(ts AS TIMESTAMP) AS ts_us,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP))::BIGINT -
                          epoch(lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id))::BIGINT > 1800
                      THEN 1 ELSE 0 END AS boundary
          FROM events) b) s
      GROUP BY user_id, session_no
      ORDER BY user_id, session_no"""))

  /** q41: top-3 per group by value — WindowGroupLimit pushes the limit
    * below the shuffle (verified in the plan audit).
    */
  val q41 = GraftQuery(
    "q41_topn_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("rn"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("rn"))
    },
    Some("""
      SELECT event_type, rn, event_id, value FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY value DESC, event_id) AS rn
        FROM events) t
      WHERE rn <= 3
      ORDER BY event_type, rn"""))

  /** q42: pivot (conditional aggregation) — event-type counts per user.
    * The oracle uses portable conditional sums; Spark uses the native
    * pivot with pinned values (same plan family: partial hash aggregate).
    */
  val q42 = GraftQuery(
    "q42_pivot",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  /** q45: Spark-native session windows (`session_window`) — same 30-min
    * gap semantics as q40; window end = last event + gap, which the oracle
    * reproduces as max(ts)+interval.
    */
  val q45 = GraftQuery(
    "q45_session_window",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(d2(col("value"))).cast("double").as("session_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""
      SELECT user_id,
             min(ts_us) AS session_start,
             max(ts_us) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM (
        SELECT user_id, value, ts_us,
               sum(boundary) OVER (PARTITION BY user_id
                 ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM (
          SELECT user_id, event_id, value,
                 CAST(ts AS TIMESTAMP) AS ts_us,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP))::BIGINT -
                          epoch(lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id))::BIGINT >= 1800
                      THEN 1 ELSE 0 END AS boundary
          FROM events) b) s
      GROUP BY user_id, session_no
      ORDER BY user_id, session_start"""))

  val all: Seq[GraftQuery] = Seq(q40, q41, q42, q45)
}
