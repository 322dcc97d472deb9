package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Semi-structured column parsing: typed extraction from a JSON payload
  * column (the `props` sidecar every event pipeline carries) and
  * aggregation over the extracted fields.
  *
  * Scale shape: `from_json` with an EXPLICIT schema is a narrow map —
  * parsing happens where the row already lives, no shuffle, no driver
  * schema inference pass (spark.read.json's sampling inference is a full
  * extra scan at corpus scale; a declared schema skips it and pins the
  * contract). The aggregate is O(event types).
  */
object SemiStructured {

  val PropsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Per event type, stats over the JSON field props.k: count of parsed
    * rows, min/max/sum, distinct values. Unparseable payloads become null
    * and are excluded (counted via n_null for auditability).
    */
  def jsonFieldStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), PropsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        count(lit(1)).minus(count(col("k"))).as("n_null"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        sum(col("k")).as("k_sum"),
        countDistinct(col("k")).as("k_distinct"))
      .orderBy(col("event_type"))

  // ---- queries -------------------------------------------------------------

  val qJson = GraftQuery(
    "q107_json_extract",
    (s, dir) => jsonFieldStats(Tables.events(s, dir)),
    Some("""
      WITH e AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events)
      SELECT event_type,
             count(k) AS n,
             count(*) - count(k) AS n_null,
             min(k) AS k_min,
             max(k) AS k_max,
             CAST(sum(k) AS BIGINT) AS k_sum,
             count(DISTINCT k) AS k_distinct
      FROM e GROUP BY event_type
      ORDER BY event_type"""))

  val queries: Seq[GraftQuery] = Seq(qJson)
}
