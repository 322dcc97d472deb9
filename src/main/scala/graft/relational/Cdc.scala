package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture surface: SCD Type-2 dimension building (attribute
  * history with validity ranges) and changelog merge/upsert (the MERGE INTO
  * apply step of a CDC pipeline, lakehouse-style).
  *
  * Scale shapes: both operators shuffle ONCE on the entity key. The SCD2
  * windows are per-key (partition work bounded by that key's change count,
  * the accepted per-key class); the merge's keep-latest window plans as
  * WindowGroupLimit (map-side pre-trim — the exchange carries one candidate
  * row per key per input partition, not the full changelog). The apply is a
  * single full-outer equi-join of two O(keys) tables.
  *
  * Determinism: event order is (ts, event_id) — a total order, so results
  * are partitioning- and arrival-order-independent, which is also what
  * makes a batch DuckDB oracle valid.
  */
object Cdc {

  /** SCD Type-2 history: per entity, the sequence of attribute versions with
    * [valid_from, valid_to) ranges. Consecutive equal attributes collapse
    * into one version (a re-stated value is not a new version); the open
    * version has null valid_to and is_current = true.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_type").as("attr"), col("ts"), col("event_id"))
      .withColumn("prev_attr", lag(col("attr"), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col("attr"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("attr"), col("version"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** CDC merge: apply a keyed changelog (op in I/U/D, ordered by (ts, id))
    * onto a base snapshot. Per key only the LATEST change wins: D deletes
    * the row, I/U upserts the new value; unmatched base rows pass through.
    * Returns (key, bal, status) — the merged snapshot with row provenance.
    */
  def cdcMerge(base: DataFrame, changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("event_id").desc)
    val latest = changelog
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("op"), col("newval"))
    base.join(latest, base("c_custkey") === latest("key"), "full_outer")
      .filter(col("key").isNull || col("op") =!= "D")
      .select(
        coalesce(col("c_custkey"), col("key")).as("key"),
        when(col("key").isNull, col("c_acctbal")).otherwise(col("newval")).as("bal"),
        when(col("key").isNull, "unchanged")
          .when(col("c_custkey").isNull, "inserted")
          .otherwise("updated").as("status"))
      .orderBy(col("key"))
  }

  /** The registry changelog, derived deterministically from events:
    * signup → insert, error → delete, anything else → update.
    */
  def eventChangelog(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("key"),
      when(col("event_type") === "signup", "I")
        .when(col("event_type") === "error", "D")
        .otherwise("U").as("op"),
      col("value").as("newval"),
      col("ts"), col("event_id"))

  // ---- queries -------------------------------------------------------------

  val qScd2 = GraftQuery(
    "q100_scd2",
    (s, dir) => scd2History(Tables.events(s, dir)),
    Some("""
      WITH e AS (SELECT user_id, event_type AS attr, CAST(ts AS TIMESTAMP) AS ts, event_id
                 FROM events),
      ch AS (
        SELECT user_id, attr, ts, event_id,
               lag(attr) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        FROM e),
      v AS (
        SELECT user_id, attr, ts, event_id
        FROM ch WHERE prev_attr IS NULL OR prev_attr <> attr)
      SELECT user_id, attr,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      FROM v
      ORDER BY user_id, version"""))

  val qCdcMerge = GraftQuery(
    "q101_cdc_merge",
    (s, dir) => cdcMerge(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal")),
      eventChangelog(Tables.events(s, dir))),
    Some("""
      WITH ch AS (
        SELECT user_id AS key,
               CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
                    ELSE 'U' END AS op,
               value AS newval,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events),
      latest AS (SELECT key, op, newval FROM ch WHERE rn = 1)
      SELECT coalesce(b.c_custkey, l.key) AS key,
             CASE WHEN l.key IS NULL THEN b.c_acctbal ELSE l.newval END AS bal,
             CASE WHEN l.key IS NULL THEN 'unchanged'
                  WHEN b.c_custkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS status
      FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.key
      WHERE l.key IS NULL OR l.op <> 'D'
      ORDER BY key"""))

  val queries: Seq[GraftQuery] = Seq(qScd2, qCdcMerge)
}
