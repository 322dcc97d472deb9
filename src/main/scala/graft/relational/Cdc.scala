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

  /** SCD2 integrity audit — the data-quality gate a dimension table must
    * pass before anything point-in-time-joins against it. Over any
    * (user_id, version, valid_from, valid_to, is_current) frame, counts:
    *  - inverted: valid_to ≤ valid_from (negative-duration version)
    *  - discontiguous: next version's valid_from ≠ this valid_to
    *    (overlap or gap — for half-open ranges both are corruption)
    *  - keys_bad_current: keys with ≠ 1 open (is_current) version
    *  - version_gaps: keys whose version numbers are not 1..n
    * All-zero counts = a sound dimension. One shuffle on the entity key;
    * per-key windows over O(that key's versions).
    */
  def scd2Audit(scd2: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val flagged = scd2
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("inverted",
        when(col("valid_to").isNotNull &&
          col("valid_to") <= col("valid_from"), 1L).otherwise(0L))
      .withColumn("discontig",
        when(col("next_from").isNotNull &&
          (col("valid_to").isNull || col("next_from") =!= col("valid_to")),
          1L).otherwise(0L))
    val perKey = flagged.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_versions"),
        sum(col("inverted")).as("inverted"),
        sum(col("discontig")).as("discontig"),
        sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
        (max(col("version")) =!= count(lit(1)) ||
          min(col("version")) =!= 1).as("has_version_gap"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n_versions")).as("n_versions"),
      sum(col("inverted")).as("inverted"),
      sum(col("discontig")).as("discontiguous"),
      sum(when(col("n_current") =!= 1, 1L).otherwise(0L)).as("keys_bad_current"),
      sum(when(col("has_version_gap"), 1L).otherwise(0L)).as("version_gaps"))
  }

  val qScd2Audit = GraftQuery(
    "q172_scd2_audit",
    (s, dir) => scd2Audit(scd2History(Tables.events(s, dir))),
    // the scd2 CTE is the q100 oracle verbatim; the audit runs on top
    Some("""
      WITH e AS (SELECT user_id, event_type AS attr,
                        CAST(ts AS TIMESTAMP) AS ts, event_id
                 FROM events),
      ch AS (
        SELECT user_id, attr, ts, event_id,
               lag(attr) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_attr
        FROM e),
      v AS (
        SELECT user_id, attr, ts, event_id
        FROM ch WHERE prev_attr IS NULL OR prev_attr <> attr),
      scd2 AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS version,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL AS is_current
        FROM v),
      flagged AS (
        SELECT *,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
                 AS next_from
        FROM scd2),
      per_key AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_versions,
               CAST(sum(CASE WHEN valid_to IS NOT NULL
                              AND valid_to <= valid_from
                             THEN 1 ELSE 0 END) AS BIGINT) AS inverted,
               CAST(sum(CASE WHEN next_from IS NOT NULL
                              AND (valid_to IS NULL OR next_from <> valid_to)
                             THEN 1 ELSE 0 END) AS BIGINT) AS discontig,
               CAST(sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_current,
               (max(version) <> count(*) OR min(version) <> 1)
                 AS has_version_gap
        FROM flagged GROUP BY user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n_versions) AS BIGINT) AS n_versions,
             CAST(sum(inverted) AS BIGINT) AS inverted,
             CAST(sum(discontig) AS BIGINT) AS discontiguous,
             CAST(sum(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS keys_bad_current,
             CAST(sum(CASE WHEN has_version_gap THEN 1 ELSE 0 END) AS BIGINT)
               AS version_gaps
      FROM per_key"""))

  val queries: Seq[GraftQuery] = Seq(qScd2, qCdcMerge, qScd2Audit)
}
