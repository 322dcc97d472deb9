package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions.col

/** The pure-SQL face of the engine's custom Catalyst expressions: one
  * query written entirely in `spark.sql(...)` against the functions
  * [[graft.GraftExtensions]] registers (`graft_fingerprint`,
  * `graft_token_set_count`, `graft_simhash`) — proving the SQL
  * registration path end-to-end through the DuckDB correctness gate,
  * not just through ScalaTest. A SQL user on a cluster with
  * `spark.sql.extensions=graft.GraftExtensions` runs exactly this.
  */
object SqlFunctions {

  val qSqlFunctions = GraftQuery(
    "q174_sql_functions",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("graft_docs_v")
      s.sql("""
        SELECT doc_id,
               graft_fingerprint(text) AS fp,
               CAST(graft_token_set_count(split(trim(text), '\\s+'),
                 array('the', 'and', 'of', 'to', 'is')) AS BIGINT) AS n_marker,
               graft_simhash(split(trim(text), '\\s+'), 'md5') AS simhash64
        FROM graft_docs_v""").orderBy(col("doc_id"))
    },
    // fingerprint fragment = the q24 oracle; simhash CTEs = the q27 oracle
    Some(s"""
      WITH corpus AS (SELECT doc_id, text FROM documents),
      ${TextDedup.duckSimhash}
      SELECT c.doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(c.text, ''),
                 ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp,
             CAST(len(list_filter(regexp_split_to_array(trim(c.text), '\\s+'),
               w -> w IN ('the','and','of','to','is'))) AS BIGINT) AS n_marker,
             s.simhash64
      FROM corpus c JOIN sfp s ON c.doc_id = s.doc_id
      ORDER BY c.doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qSqlFunctions)
}
