package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Last-touch marketing attribution: each conversion (purchase) is credited
  * to the most recent touch (click) by the same user within a lookback
  * window — the canonical event-stream attribution join.
  *
  * Shape: ONE per-user window pass (the accepted per-key class) carrying
  * the last-seen touch forward with `last(..., ignoreNulls)` over the
  * (ts, event_id) total order — no self-join, no per-conversion probe.
  * The lookback test is exact integer microseconds. Same-instant
  * tie-break: a touch at the conversion's exact (ts, id)-order position or
  * earlier is eligible — deterministic because the order is total.
  */
object Attribution {

  /** Returns one row per conversion: (purchase_id, user_id, ts, value,
    * click_id, click_ts, attributed) — click columns null (attributed =
    * false) when no touch precedes the conversion within `lookbackUs`.
    */
  def lastTouchAttribution(events: DataFrame, lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be > 0, got $lookbackUs")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isClick = col("event_type") === "click"
    val carried = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("click_id", last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts", last(when(isClick, col("ts")), ignoreNulls = true).over(w))
    carried.filter(col("event_type") === "purchase")
      .withColumn("in_window",
        col("click_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("click_ts")) <= lookbackUs)
      .select(
        col("event_id").as("purchase_id"), col("user_id"), col("ts"), col("value"),
        when(col("in_window"), col("click_id")).as("click_id"),
        when(col("in_window"), col("click_ts")).as("click_ts"),
        col("in_window").as("attributed"))
      .orderBy(col("purchase_id"))
  }

  // ---- queries -------------------------------------------------------------

  val qAttribution = GraftQuery(
    "q109_attribution",
    (s, dir) => lastTouchAttribution(Tables.events(s, dir),
      lookbackUs = 7L * 86400L * 1000000L),
    Some("""
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        FROM events),
      carried AS (
        SELECT *,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        FROM e),
      p AS (
        SELECT *,
               click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000 AS in_window
        FROM carried WHERE event_type = 'purchase')
      SELECT event_id AS purchase_id, user_id, ts, value,
             CASE WHEN in_window THEN click_id END AS click_id,
             CASE WHEN in_window THEN click_ts END AS click_ts,
             in_window AS attributed
      FROM p ORDER BY purchase_id"""))

  val queries: Seq[GraftQuery] = Seq(qAttribution)
}
