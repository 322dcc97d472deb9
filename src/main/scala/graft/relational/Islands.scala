package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gaps-and-islands surface: consecutive-day activity streaks and
  * overlapping-interval merging — the two classic island constructions
  * every activity/uptime/coverage pipeline needs.
  *
  * Scale shapes:
  *  - Streaks first reduce the fact table to DISTINCT (user, day) — the
  *    per-key windows then run over O(user's active days), never raw
  *    events (the accepted per-key class). One shuffle on user_id.
  *  - Interval merge is the single-sort sweep: per key, an interval opens
  *    a new island iff its start exceeds the running max end of everything
  *    before it. Both windows share one (key, start) sort order, so the
  *    plan sorts each customer's intervals once. One shuffle on the key.
  */
object Islands {

  /** Per-user consecutive-day streak stats over the event stream:
    * (user_id, longest_streak, n_streaks, active_days). A streak is a
    * maximal run of consecutive active calendar days; the island key is
    * the classic `day - row_number` date (constant within a run).
    */
  def dayStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val islands = days
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  /** Merge overlapping/touching order-fulfillment intervals per customer
    * into coverage islands: (custkey, island, island_start, island_end,
    * n_orders, covered_days). Intervals are the q102 construction —
    * [o_orderdate, +1..30 key-derived days) — here kept per customer.
    * Touching intervals (start == running max end) merge; only a strict
    * gap opens a new island.
    */
  def mergeOrderIntervals(orders: DataFrame): DataFrame = {
    val iv = orders.select(
      col("o_custkey").as("custkey"),
      col("o_orderdate").cast("date").as("s"),
      date_add(col("o_orderdate").cast("date"),
        (col("o_orderkey") % 30 + 1).cast("int")).as("e"),
      col("o_orderkey"))
    // (s, e, orderkey) is a total order per customer (orderkey unique), so
    // both frames below are deterministic at any partitioning
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("s"), col("e"), col("o_orderkey"))
    val prevMaxEnd = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("opens",
        when(prevMaxEnd.isNull || col("s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("opens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("custkey"), col("island"))
      .agg(
        min(col("s")).as("island_start"),
        max(col("e")).as("island_end"),
        count(lit(1)).as("n_orders"))
      .select(
        col("custkey"), col("island"),
        // DATE → TIMESTAMP output edge (cross-engine compare type)
        col("island_start").cast("timestamp").as("island_start"),
        col("island_end").cast("timestamp").as("island_end"),
        col("n_orders"),
        datediff(col("island_end"), col("island_start")).cast("long")
          .as("covered_days"))
      .orderBy(col("custkey"), col("island"))
  }

  // ---- queries -------------------------------------------------------------

  val qStreaks = GraftQuery(
    "q158_streaks",
    (s, dir) => dayStreaks(Tables.events(s, dir)),
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      islands AS (
        SELECT user_id,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS grp
        FROM days),
      runs AS (
        SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        FROM islands GROUP BY user_id, grp)
      SELECT user_id,
             max(len) AS longest_streak,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(sum(len) AS BIGINT) AS active_days
      FROM runs GROUP BY user_id ORDER BY user_id"""))

  val qIntervalMerge = GraftQuery(
    "q160_interval_merge",
    (s, dir) => mergeOrderIntervals(Tables.orders(s, dir)),
    Some("""
      WITH iv AS (
        SELECT o_custkey AS custkey,
               CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE)
                 + CAST(o_orderkey % 30 + 1 AS INTEGER) AS e,
               o_orderkey
        FROM orders),
      flagged AS (
        SELECT custkey, s, e, o_orderkey,
               CASE WHEN max(e) OVER (
                        PARTITION BY custkey ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                 OR s > max(e) OVER (
                        PARTITION BY custkey ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS opens
        FROM iv),
      grp AS (
        SELECT custkey, s, e,
               sum(opens) OVER (
                 PARTITION BY custkey ORDER BY s, e, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged)
      SELECT custkey, CAST(island AS BIGINT) AS island,
             CAST(min(s) AS TIMESTAMP) AS island_start,
             CAST(max(e) AS TIMESTAMP) AS island_end,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(date_diff('day', min(s), max(e)) AS BIGINT) AS covered_days
      FROM grp GROUP BY custkey, island
      ORDER BY custkey, island"""))

  val queries: Seq[GraftQuery] = Seq(qStreaks, qIntervalMerge)
}
