package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch point-in-interval range join with bucketed expansion — the batch
  * dual of the streaming interval join (EventsStream.purchaseViewJoin).
  *
  * The naive plan for `points JOIN intervals ON key AND ts BETWEEN s AND e`
  * is an equi-join on `key` with the range as a post-join filter: every
  * point of a key is checked against EVERY interval of that key —
  * O(points_per_key · intervals_per_key) probe work that concentrates in
  * hot keys (a month of one user's events under one join key). Bucketing
  * time into `maxSpan`-wide cells and adding the bucket to the equality
  * key bounds each probe to the ≤ spanBuckets+1 cells an interval can
  * touch: probe work drops to O(matches), and state spreads across
  * (key, time-cell) — the same trick the streaming join uses, reusable
  * for any batch containment join (sessions×events, windows×readings).
  *
  * Contract: every interval must satisfy `end - start <= maxSpan` (checked
  * per row — violating rows would silently lose matches, so they fail
  * fast) and `start <= end`. Each qualifying (point, interval) pair
  * matches in EXACTLY one bucket — the point's own cell — so no
  * post-join dedup is needed.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows of the same `keys` whose
    * [startTs, endTs] contains pointTs. Both inputs keep all their
    * columns; column names must not collide (standard join hygiene).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[(String, String)], pointTs: String,
                      startTs: String, endTs: String,
                      maxSpan: String): DataFrame = {
    val widthUs = expr(
      s"unix_micros(timestamp'1970-01-01 00:00:00Z' + INTERVAL $maxSpan)")
    // fail fast on intervals wider than the bucket width — they would
    // need more cells than we explode and would silently miss matches.
    // A filter (not an auxiliary column) so Catalyst can't prune the check.
    val checked = intervals.filter(
      when((unix_micros(col(endTs)) - unix_micros(col(startTs)))
          .between(lit(0), widthUs), lit(true))
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval [$startTs,$endTs] exceeds maxSpan=$maxSpan or is negative for "),
          col(startTs).cast("string"), lit(".."), col(endTs).cast("string")))))
    // an interval of width <= maxSpan overlaps at most 2 adjacent cells;
    // array_distinct collapses the same-cell case row-locally (no shuffle)
    val expanded = checked
      .withColumn("__cell", explode(array_distinct(array(
        floor(unix_micros(col(startTs)) / widthUs),
        floor(unix_micros(col(endTs)) / widthUs)))))
    val bucketedPoints = points
      .withColumn("__pcell", floor(unix_micros(col(pointTs)) / widthUs))
    val keyCond = keys.map { case (pk, ik) => col(pk) === col(ik) }
      .reduce(_ && _)
    bucketedPoints.join(expanded,
        keyCond && col("__pcell") === col("__cell") &&
          col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__pcell", "__cell")
  }

  /** q57: clicks landing inside the 4-hour window after the same
    * user's error event — sessions×events-shaped containment, run through
    * the bucketed range join. The oracle is the plain inequality join in
    * DuckDB; matching results proves the bucket expansion loses/duplicates
    * nothing.
    */
  val qRangeJoin = GraftQuery(
    "q57_range_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 4 HOURS")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      pointInInterval(clicks, errors,
          keys = Seq("user_id" -> "e_user"), pointTs = "c_ts",
          startTs = "w_start", endTs = "w_end", maxSpan = "4 HOURS")
        .select(col("user_id"), col("error_id"), col("click_id"),
          col("c_ts"), col("w_start"))
        .orderBy(col("error_id"), col("click_id"))
    },
    Some("""
      SELECT e.user_id, e.error_id, c.click_id, c.c_ts, e.w_start
      FROM (SELECT user_id, event_id AS error_id,
                   CAST(ts AS TIMESTAMP) AS w_start,
                   CAST(ts AS TIMESTAMP) + INTERVAL 4 HOUR AS w_end
            FROM events WHERE event_type = 'error') e
      JOIN (SELECT user_id AS c_user, event_id AS click_id,
                   CAST(ts AS TIMESTAMP) AS c_ts
            FROM events WHERE event_type = 'click') c
        ON e.user_id = c.c_user
       AND c.c_ts >= e.w_start
       AND c.c_ts <= e.w_end
      ORDER BY error_id, click_id"""))

  val queries: Seq[GraftQuery] = Seq(qRangeJoin)
}
