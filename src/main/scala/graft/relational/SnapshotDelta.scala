package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance: diff two snapshots of a document table
  * into per-doc statuses (added / removed / changed / unchanged) — the
  * operator behind incremental recrawl ingestion, "what changed since the
  * last training dump" audits, and delta-only downstream recomputes.
  *
  * At 100 TB both snapshots are projected map-side to slim (doc_id,
  * content-hash) pairs before the single full-outer equi-join — the text
  * never shuffles, and the join co-partitions on the id. Change detection
  * is 64-bit content hashing (collision caveat documented at
  * [[graft.text.TextDedup]]; the DuckDB oracle compares the text itself,
  * so a collision would fail the gate).
  */
object SnapshotDelta {

  def snapshotDelta(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.select(col("doc_id"), xxhash64(col("text")).as("oh"))
    val n = newDf.select(col("doc_id"), xxhash64(col("text")).as("nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") === col("nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .orderBy(col("doc_id"))
  }

  // ---- queries -------------------------------------------------------------

  /** q77: the "old" snapshot is derived deterministically from the current
    * one — docs ≡0 (mod 10) were absent (→ added), docs ≡0 (mod 7) carried
    * different text (→ changed), and a shifted id range existed only in the
    * old snapshot (→ removed) — so all four statuses are exercised.
    */
  val qSnapshotDelta = GraftQuery(
    "q77_snapshot_delta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val oldSnap = docs
        .filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" EDITED")))
            .otherwise(col("text")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      snapshotDelta(oldSnap, docs)
    },
    Some("""
      WITH old AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' EDITED' ELSE text END AS text
        FROM documents WHERE doc_id % 10 != 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
      )
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.text = n.text THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old o FULL OUTER JOIN documents n ON o.doc_id = n.doc_id
      ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qSnapshotDelta)
}
