package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Growth analytics over the events stream: cumulative distinct users and
  * month-over-month growth accounting (new / retained / resurrected /
  * churned) — the standard product-analytics decomposition.
  *
  * Scale shapes:
  *  - Cumulative distinct is NOT a running COUNT(DISTINCT) over raw rows
  *    (quadratic re-scan class): a user's first-seen date reduces the
  *    fact table once, daily first-seen counts are O(dates), and the
  *    running sum window runs over the aggregated calendar — the q102
  *    sweep-line shape.
  *  - Growth accounting reduces to one (user, month) distinct aggregate,
  *    a per-user lag window over O(user's active months) rows, then an
  *    O(months) rollup. Churn is the next month's mirror of retention:
  *    emitted by shifting each active month forward, so no calendar
  *    spine join is needed.
  */
object Growth {

  /** (d, new_users, cumulative_users) per active date. */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val firstSeen = events
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .groupBy(col("user_id")).agg(min(col("d")).as("d"))
    val daily = firstSeen.groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select(col("d").cast("timestamp").as("d"), col("new_users"),
        sum(col("new_users")).over(w).as("cumulative_users"))
      .orderBy(col("d"))
  }

  /** Per month: users active this month split into new (first month),
    * retained (also active previous month), resurrected (active before,
    * not previous month), plus churned (active previous month, not this
    * one).
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val um = events
      .select(col("user_id"), date_trunc("month", col("ts")).as("m"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("m"))
    val classified = um
      .withColumn("prev", lag(col("m"), 1).over(w))
      .withColumn("status",
        when(col("prev").isNull, lit("new"))
          .when(col("prev") === add_months(col("m"), -1).cast("timestamp"), lit("retained"))
          .otherwise(lit("resurrected")))
    val active = classified.groupBy(col("m"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("resurrected"))
    // a user active in month m churns in m+1 unless also active there:
    // count actives per month shifted forward, minus next-month retained
    val churnBase = um.select(add_months(col("m"), 1).cast("timestamp").as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("prev_active"))
    active.join(churnBase, Seq("m"), "left")
      .select(col("m").cast("timestamp").as("m"), col("new_users"),
        col("retained"), col("resurrected"),
        (coalesce(col("prev_active"), lit(0L)) - col("retained")).as("churned"))
      .orderBy(col("m"))
  }

  // ---- queries -------------------------------------------------------------

  val qCumulativeUsers = GraftQuery(
    "q139_cumulative_users",
    (s, dir) => cumulativeUsers(Tables.events(s, dir)),
    Some("""
      WITH first_seen AS (
        SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        FROM events GROUP BY user_id),
      daily AS (SELECT d, count(*) AS new_users FROM first_seen GROUP BY d)
      SELECT CAST(d AS TIMESTAMP) AS d,
             CAST(new_users AS BIGINT) AS new_users,
             CAST(sum(new_users) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
      FROM daily ORDER BY d"""))

  val qGrowthAccounting = GraftQuery(
    "q140_growth_accounting",
    (s, dir) => growthAccounting(Tables.events(s, dir)),
    Some("""
      WITH um AS (
        SELECT DISTINCT user_id,
               date_trunc('month', CAST(ts AS TIMESTAMP)) AS m
        FROM events),
      classified AS (
        SELECT user_id, m,
               lag(m, 1) OVER (PARTITION BY user_id ORDER BY m) AS prev
        FROM um),
      active AS (
        SELECT m,
               CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS new_users,
               CAST(sum(CASE WHEN prev = m - INTERVAL 1 MONTH
                             THEN 1 ELSE 0 END) AS BIGINT) AS retained,
               CAST(sum(CASE WHEN prev IS NOT NULL
                              AND prev <> m - INTERVAL 1 MONTH
                             THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        FROM classified GROUP BY m),
      churn_base AS (
        SELECT m + INTERVAL 1 MONTH AS m, count(*) AS prev_active
        FROM um GROUP BY 1)
      SELECT CAST(a.m AS TIMESTAMP) AS m, a.new_users, a.retained,
             a.resurrected,
             CAST(coalesce(c.prev_active, 0) - a.retained AS BIGINT)
               AS churned
      FROM active a LEFT JOIN churn_base c ON a.m = c.m
      ORDER BY m"""))

  val queries: Seq[GraftQuery] = Seq(qCumulativeUsers, qGrowthAccounting)
}
