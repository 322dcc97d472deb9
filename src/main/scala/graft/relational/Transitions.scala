package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition matrix over per-user event sequences:
  * P(next event type | current type), the behavioral fingerprint used
  * for journey modeling, anomaly screens, and next-step prediction
  * baselines.
  *
  * Scale shape: one per-user lead window over the user's own rows (the
  * accepted per-key class — a user's history is bounded), one
  * (from, to) count aggregate (partial-aggregated map-side, O(types²)
  * rows), and an O(types) totals join. Probabilities divide exact
  * BIGINTs, so the doubles are engine-identical.
  */
object Transitions {

  /** (from_type, to_type, n, prob) rows; per-user sequence order is the
    * (ts, event_id) total order so ties cannot reorder across engines.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("from_type")).agg(sum(col("n")).as("t"))
    cells.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("t").cast("double")).as("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  // ---- queries -------------------------------------------------------------

  val qTransitions = GraftQuery(
    "q134_event_transitions",
    (s, dir) => eventTransitions(Tables.events(s, dir)),
    Some("""
      WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        FROM events),
      cells AS (
        SELECT from_type, to_type, count(*) AS n
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type),
      tot AS (SELECT from_type, sum(n) AS t FROM cells GROUP BY from_type)
      SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
             CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS prob
      FROM cells c JOIN tot t USING (from_type)
      ORDER BY c.from_type, c.to_type"""))

  val queries: Seq[GraftQuery] = Seq(qTransitions)
}
