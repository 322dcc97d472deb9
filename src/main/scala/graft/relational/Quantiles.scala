package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact per-group quantile VALUES (p50/p90/p99) computed from aggregated
  * count tables — the companion to q79's percent-rank normalization.
  *
  * Scale shape (the q79 lesson applied to quantile extraction): windows
  * NEVER run per-row. Values collapse to (group, value, count) first, the
  * cumulative count runs over O(distinct values) aggregated rows per
  * group, and the quantile pick is a bounded aggregate over the filtered
  * cumulative table. A hot group costs its distinct-value count, not its
  * row count.
  *
  * Determinism: the discrete quantile (smallest value whose cumulative
  * count reaches ceil(q·n)) is rank arithmetic on exact integers; q is a
  * DECIMAL literal in BOTH engines so ceil(q·n) is exact — a double 0.99
  * would put the product one ulp above/below an integer and shift the
  * rank by one.
  */
object Quantiles {

  val Probes: Seq[(String, String)] =
    Seq("p50" -> "0.50", "p90" -> "0.90", "p99" -> "0.99")

  /** Per (group, probe): the exact discrete quantile of `valueCol`. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val counts = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("c")).over(w))
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    val probes = Probes
      .map { case (label, q) => (label, BigDecimal(q)) }
      .toDF("probe", "q")
    cum.join(totals, Seq(groupCol))
      .crossJoin(broadcast(probes)) // constant 3-row probe table
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col(groupCol), col("probe"))
      .agg(min(col("v")).as("quantile"))
      .orderBy(col(groupCol), col("probe"))
  }

  // ---- queries -------------------------------------------------------------

  val qQuantiles = GraftQuery(
    "q110_group_quantiles",
    (s, dir) => groupQuantiles(Tables.events(s, dir), "event_type", "value"),
    Some("""
      WITH counts AS (
        SELECT event_type, value AS v, count(*) AS c
        FROM events GROUP BY event_type, v),
      cum AS (
        SELECT event_type, v, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM counts),
      totals AS (SELECT event_type, sum(c) AS n FROM counts GROUP BY event_type),
      probes AS (
        SELECT * FROM (VALUES ('p50', 0.50), ('p90', 0.90), ('p99', 0.99))
          t(probe, q))
      SELECT c.event_type, p.probe, min(c.v) AS quantile
      FROM cum c JOIN totals t ON c.event_type = t.event_type
      CROSS JOIN probes p
      WHERE c.cum >= ceil(p.q * t.n)
      GROUP BY c.event_type, p.probe
      ORDER BY c.event_type, p.probe"""))

  val queries: Seq[GraftQuery] = Seq(qQuantiles)
}
