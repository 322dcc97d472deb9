package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B independence testing from contingency counts: split users into two
  * deterministic cohorts (user_id parity — the hash-bucket assignment an
  * experiment framework produces) and, per event type, test whether the
  * type's incidence is independent of cohort via the 2×2 chi-square
  * statistic with the rate lift.
  *
  * Scale shape: ONE (cohort, event_type) count aggregate over the fact
  * table (map-side combinable), then O(event_types) arithmetic — the
  * contingency pivot is two conditional sums, never a second scan.
  *
  * Determinism: all four cell counts are exact BIGINTs; ad−bc stays in
  * BIGINT (|ad| < 2^63 up to ~3e9 rows per cell), and only the final
  * chi²/lift expressions run in double — an identical operation tree on
  * identical integer inputs in both engines.
  */
object AbTest {

  /** Per event type: the 2×2 chi-square of (cohort × is-this-type) and
    * the cohort-A/cohort-B incidence lift.
    */
  def chiSquare(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy((col("user_id") % 2 === 0).as("cohort_a"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("cohort_a")).agg(sum(col("c")).as("t"))
    val cells = counts.join(totals, Seq("cohort_a"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("cohort_a"), col("c")).otherwise(lit(0L))).as("a"),
        sum(when(col("cohort_a"), col("t") - col("c")).otherwise(lit(0L))).as("b"),
        sum(when(!col("cohort_a"), col("c")).otherwise(lit(0L))).as("cc"),
        sum(when(!col("cohort_a"), col("t") - col("c")).otherwise(lit(0L))).as("d"))
    def dd(c: String): Column = col(c).cast("double")
    val det = (col("a") * col("d") - col("b") * col("cc")).cast("double")
    val n = (col("a") + col("b") + col("cc") + col("d")).cast("double")
    // degenerate-table guards (oracle mirrors with CASE): a zero marginal
    // (an empty cohort or an all-one-cohort event type — guaranteed when
    // only one user exists) makes chi² undefined; lift is undefined when
    // either cohort is empty or cohort B's rate is 0. NULL, not an abort.
    val chi2den = (dd("a") + dd("b")) * (dd("cc") + dd("d")) *
      (dd("a") + dd("cc")) * (dd("b") + dd("d"))
    cells.select(col("event_type"),
      col("a").as("n_a"), col("cc").as("n_b"),
      when(chi2den === 0.0, lit(null).cast("double"))
        .otherwise((n * det * det) / chi2den).as("chi2"),
      when(col("a") + col("b") === 0 || col("cc") + col("d") === 0 ||
        col("cc") === 0, lit(null).cast("double"))
        .otherwise((dd("a") / (dd("a") + dd("b"))) /
          (dd("cc") / (dd("cc") + dd("d")))).as("lift"))
      .orderBy(col("event_type"))
  }

  // ---- queries -------------------------------------------------------------

  val qChiSquare = GraftQuery(
    "q125_ab_chi_square",
    (s, dir) => chiSquare(Tables.events(s, dir)),
    Some("""
      WITH counts AS (
        SELECT (user_id % 2 = 0) AS cohort_a, event_type, count(*) AS c
        FROM events GROUP BY cohort_a, event_type),
      totals AS (SELECT cohort_a, sum(c) AS t FROM counts GROUP BY cohort_a),
      cells AS (
        SELECT event_type,
               CAST(sum(CASE WHEN cohort_a THEN c ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN cohort_a THEN t - c ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT cohort_a THEN c ELSE 0 END) AS BIGINT) AS cc,
               CAST(sum(CASE WHEN NOT cohort_a THEN t - c ELSE 0 END) AS BIGINT) AS d
        FROM counts JOIN totals USING (cohort_a)
        GROUP BY event_type)
      SELECT event_type, a AS n_a, cc AS n_b,
             CASE WHEN a + b = 0 OR cc + d = 0 OR a + cc = 0 OR b + d = 0 THEN NULL
                  ELSE (CAST(a + b + cc + d AS DOUBLE) *
                        CAST(a * d - b * cc AS DOUBLE) *
                        CAST(a * d - b * cc AS DOUBLE)) /
                         ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) *
                          (CAST(cc AS DOUBLE) + CAST(d AS DOUBLE)) *
                          (CAST(a AS DOUBLE) + CAST(cc AS DOUBLE)) *
                          (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)))
             END AS chi2,
             CASE WHEN a + b = 0 OR cc + d = 0 OR cc = 0 THEN NULL
                  ELSE ((CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))) /
                        (CAST(cc AS DOUBLE) / (CAST(cc AS DOUBLE) + CAST(d AS DOUBLE))))
             END AS lift
      FROM cells ORDER BY event_type"""))

  val queries: Seq[GraftQuery] = Seq(qChiSquare)
}
