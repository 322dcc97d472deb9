package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication (the CCNet / RefinedWeb paragraph-dedup
  * pass): split every document into lines on a literal delimiter, drop each
  * duplicated line everywhere EXCEPT its earliest occurrence corpus-wide
  * (keep-first, ordered by (doc_id, idx)), and reassemble the surviving
  * lines in original order. Lines shorter than `minChars` are exempt — they
  * are navigation crumbs / headers in real corpora and deduping them would
  * shred every document.
  *
  * Distributed shape (the part that must survive 100 TB):
  *   - lines are derived NARROWLY from the text (split + posexplode); the
  *     only thing shuffled to find duplicates is (xxhash64(line), doc_id,
  *     idx) — the text itself never crosses the wire;
  *   - keep-first is a hash-keyed `min(struct(doc_id, idx))` aggregate with
  *     map-side partial aggregation; hashes seen once are filtered out
  *     before the join back, so the dup side is only the duplicated tail;
  *   - the drop-set comes back as slim (doc_id, idx) pairs, collapsed to one
  *     bounded int-array per affected doc (≤ n_lines entries), and joined
  *     onto the original docs (AQE broadcasts it when small — no hint, the
  *     drop-set's cardinality is corpus-dependent);
  *   - reassembly is a narrow re-split + index-filter + concat_ws, same
  *     pattern as [[TextDedup.removeDupSpans]].
  *
  * Duplicate detection is by 64-bit line hash (collision odds documented at
  * [[TextDedup]]'s fingerprint ops); the DuckDB oracle groups by the line
  * string itself, so a collision would surface as a hash mismatch.
  */
object LineDedup {

  /** @param delim   literal line delimiter (split AND rejoin; regex
    *                metacharacters are escaped so split semantics equal a
    *                literal string split in any engine)
    * @param minChars lines shorter than this are never deduplicated
    */
  def dedupLines(docs: DataFrame, delim: String, minChars: Int): DataFrame = {
    require(delim.nonEmpty, "delim must be non-empty")
    require(minChars >= 0, s"minChars must be >= 0, got $minChars")
    val pat = java.util.regex.Pattern.quote(delim)
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), pat, -1)).as(Seq("idx", "line")))

    // Only lines long enough to dedup participate; project to slim triples
    // BEFORE the shuffle so text never leaves the map side.
    val occ = lines
      .filter(length(col("line")) >= minChars)
      .select(xxhash64(col("line")).as("h"), col("doc_id"), col("idx"))

    val dupFirsts = occ
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("h"), col("first"))

    // Every non-first occurrence of a duplicated line, as slim (doc, idx).
    val dropped = occ
      .join(dupFirsts, Seq("h"))
      .filter(struct(col("doc_id"), col("idx")) =!= col("first"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("idx")).as("drop_idx"))

    val noDrops = array().cast("array<int>")
    docs
      .join(dropped, Seq("doc_id"), "left")
      .withColumn("drop_idx", coalesce(col("drop_idx"), noDrops))
      .select(
        col("doc_id"),
        concat_ws(delim,
          filter(split(col("text"), pat, -1),
            (_, i) => !array_contains(col("drop_idx"), i))).as("clean_text"),
        size(col("drop_idx")).cast("long").as("n_lines_removed"))
      .orderBy(col("doc_id"))
  }

  // ---- queries -------------------------------------------------------------

  /** q73: the synthetic corpus has no newlines, so the registry instance
    * uses a frequent literal token span (" the ") as the line delimiter —
    * the machinery is byte-identical to splitting on '\n'; the spec
    * exercises real newline-delimited documents.
    */
  val qLineDedup = GraftQuery(
    "q73_line_dedup",
    (s, dir) => dedupLines(Tables.documents(s, dir), " the ", minChars = 12),
    Some("""
      WITH ls AS (
        SELECT doc_id, text, string_split(text, ' the ') AS ls FROM documents
      ), lines AS (
        SELECT doc_id, u.idx AS idx, u.line AS line FROM (
          SELECT doc_id, unnest(list_transform(generate_series(1, len(ls)),
            i -> struct_pack(idx := i - 1, line := ls[i]))) AS u
          FROM ls) s
      ), occ AS (
        SELECT doc_id, idx,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn,
               count(*) OVER (PARTITION BY line) AS n
        FROM lines WHERE len(line) >= 12
      ), dropped AS (
        SELECT doc_id, idx FROM occ WHERE n > 1 AND rn > 1
      ), kept AS (
        SELECT l.doc_id, l.idx, l.line FROM lines l
        WHERE NOT EXISTS (SELECT 1 FROM dropped d
          WHERE d.doc_id = l.doc_id AND d.idx = l.idx)
      ), ka AS (
        SELECT doc_id, string_agg(line, ' the ' ORDER BY idx) AS clean_text
        FROM kept GROUP BY doc_id
      ), nd AS (
        SELECT doc_id, count(*) AS n_removed FROM dropped GROUP BY doc_id
      )
      SELECT d.doc_id AS doc_id,
             coalesce(ka.clean_text, '') AS clean_text,
             CAST(coalesce(nd.n_removed, 0) AS BIGINT) AS n_lines_removed
      FROM documents d
      LEFT JOIN ka ON d.doc_id = ka.doc_id
      LEFT JOIN nd ON d.doc_id = nd.doc_id
      ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qLineDedup)
}
