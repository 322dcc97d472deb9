package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batching stats: assign every document to the smallest
  * power-of-two token-count bucket and report the padding cost per bucket
  * — the batch-shape audit a training pipeline runs before choosing
  * sequence-length buckets (padding waste = tokens burned padding each doc
  * up to its bucket cap).
  *
  * Scale shape: one narrow map computes the bucket key (no shuffle), then
  * an O(buckets) groupBy that partial-aggregates map-side — bucket count
  * is ~log2(max doc length), so the shuffle carries a few dozen rows per
  * partition whatever the corpus size.
  *
  * Determinism: the bucket is integer arithmetic only — binary-string
  * length for floor(log2 n)+1 and an `n & (n-1)` power-of-two test. A
  * float `ceil(log2(n))` would be one ulp under k at exact powers of two
  * in log-ratio implementations and overshoot the bucket; bit arithmetic
  * cannot. Waste fractions divide exact BIGINTs cast to double, identical
  * in both engines.
  */
object TrainingBatch {

  /** Smallest power of two >= n as a BIGINT column (n = 0 and 1 both map
    * to bucket 1): shift 1 left by `len(bin(n)) - [n is a power of two]`.
    */
  private def pow2Bucket(n: String): String =
    s"shiftleft(CAST(1 AS BIGINT), CAST(length(bin($n)) AS INT) - " +
      s"(CASE WHEN ($n & ($n - 1)) = 0 THEN 1 ELSE 0 END))"

  def lengthBuckets(docs: DataFrame): DataFrame =
    docs.select(TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .select(col("n"), expr(pow2Bucket("n")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        ((col("bucket") * col("n_docs") - col("total_tokens")).cast("double") /
          (col("bucket") * col("n_docs")).cast("double")).as("pad_waste"))
      .orderBy(col("bucket"))

  // ---- queries -------------------------------------------------------------

  val qLengthBuckets = GraftQuery(
    "q120_length_buckets",
    (s, dir) => lengthBuckets(Tables.documents(s, dir)),
    Some("""
      WITH tok AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               END AS n
        FROM documents),
      b AS (
        SELECT n,
               (CAST(1 AS BIGINT) << (length(bin(n)) -
                  CASE WHEN (n & (n - 1)) = 0 THEN 1 ELSE 0 END)) AS bucket
        FROM tok)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_tokens,
             CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
             CAST(bucket * count(*) - sum(n) AS DOUBLE) /
               CAST(bucket * count(*) AS DOUBLE) AS pad_waste
      FROM b GROUP BY bucket ORDER BY bucket"""))

  val queries: Seq[GraftQuery] = Seq(qLengthBuckets)
}
