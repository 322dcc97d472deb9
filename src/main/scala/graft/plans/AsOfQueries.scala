package graft.plans

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** As-of join over events: each purchase joined to the user's most recent
  * view at-or-before the purchase time — oracle-checked against DuckDB's
  * native ASOF LEFT JOIN.
  */
object AsOfQueries {

  val qAsOf = GraftQuery(
    "q39_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("event_id").as("view_event_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      AsOf.join(purchases, views,
          Seq("user_id"), Seq("v_user_id"), "ts", "view_ts",
          rightTiebreak = Seq("view_event_id"))
        .select(col("user_id"), col("event_id"), col("ts").as("ts_us"),
          col("value"), col("view_event_id"), col("view_ts").as("view_ts_us"),
          col("view_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT p.user_id, p.event_id, p.ts_us, p.value,
             v.view_event_id, v.view_ts_us, v.view_value
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts_us, value
            FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN
           (SELECT user_id AS v_user_id, event_id AS view_event_id,
                   CAST(ts AS TIMESTAMP) AS view_ts_us, value AS view_value
            FROM events WHERE event_type = 'view') v
        ON p.user_id = v.v_user_id AND p.ts_us >= v.view_ts_us
      ORDER BY user_id, event_id"""))

  val queries: Seq[GraftQuery] = Seq(qAsOf)
}
