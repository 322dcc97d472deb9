package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top navigation paths: the ordered event-type sequence of each
  * (user, day) session, truncated to its first `depth` steps, ranked by
  * frequency — the Sankey/top-paths report of product analytics.
  *
  * Scale shape: one shuffle on (user, day); the per-session sequence is
  * an array aggregate sorted inside the group (bounded by the session's
  * own events), and the path ranking is an O(distinct paths) aggregate
  * + TakeOrdered top-k. The (ts, event_id) sort key makes the sequence
  * a total order, so the path strings are partitioning-independent.
  */
object TopPaths {

  /** (path, n_sessions) for the k most frequent depth-capped paths;
    * ties broken by path string for a deterministic dump.
    */
  def topPaths(events: DataFrame, depth: Int, k: Int): DataFrame = {
    require(depth >= 1 && k >= 1, s"bad depth=$depth k=$k")
    val sessions = events
      .select(col("user_id"), col("ts").cast("date").as("d"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"), col("d"))
      .agg(sort_array(collect_list(col("e"))).as("seq"))
      .select(array_join(
        slice(transform(col("seq"), x => x.getField("event_type")), 1, depth),
        ">").as("path"))
    sessions.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  // ---- queries -------------------------------------------------------------

  val qTopPaths = GraftQuery(
    "q177_top_paths",
    (s, dir) => topPaths(Tables.events(s, dir), depth = 4, k = 20),
    Some("""
      WITH sessions AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               array_to_string(
                 list(event_type ORDER BY ts, event_id)[1:4], '>') AS path
        FROM events GROUP BY user_id, d)
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM sessions GROUP BY path
      ORDER BY n_sessions DESC, path
      LIMIT 20"""))

  val queries: Seq[GraftQuery] = Seq(qTopPaths)
}
