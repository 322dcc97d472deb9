package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) query: the set of (price, size) profiles not
  * dominated by any other — q dominates p when q.price ≤ p.price and
  * q.size ≥ p.size with at least one strict ("cheaper and at least as
  * big, or same price and bigger"). The classic multi-criteria shortlist
  * operator (Börzsönyi et al., ICDE 2001).
  *
  * Scale shape — a partitioned sweep, never all-pairs and never a global
  * row-level window:
  *   1. collapse rows to DISTINCT (price, size) pairs with member counts
  *      (one hash aggregate; on distinct pairs, dominance is exactly
  *      (≤, ≥) with q ≠ p, which removes the tie-breaking case split);
  *   2. range-bucket by price (equi-width over the observed bounds, the
  *      Olap.histogram idiom) and run the 2-D sweep WITHIN each bucket:
  *      order by (price asc, size desc); a pair survives iff the running
  *      max of size over STRICTLY PREVIOUS rows is below its size —
  *      every earlier row has lower price (any size) or equal price and
  *      strictly larger size, so "running max ≥ size" is exactly
  *      "a dominator precedes me", and later rows can never dominate;
  *   3. cross-bucket prune on the O(buckets) per-bucket size maxima:
  *      every point in an earlier bucket has strictly lower price (a
  *      price on a bucket boundary belongs to the later bucket), so a
  *      local-skyline point survives globally iff its size exceeds the
  *      running max of all earlier buckets' maxima.
  * The only per-row window is partitioned by bucket; the only
  * single-partition window is over ≤ nBuckets rows. The result is
  * provably identical to the one-pass global sweep (the oracle's form).
  */
object Skyline {

  /** Global skyline of (minimize priceCol, maximize sizeCol) as distinct
    * (price, size, n) profiles, n = number of source rows on the point.
    */
  def skyline(df: DataFrame, priceCol: String, sizeCol: String,
              nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val pts = df
      .select(col(priceCol).as("price"), col(sizeCol).as("size"))
      .filter(col("price").isNotNull && col("size").isNotNull)
      .groupBy(col("price"), col("size"))
      .agg(count(lit(1)).as("n"))
    val bounds = pts.agg(min(col("price")).as("mn"), max(col("price")).as("mx"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .select(col("price"), col("size"), col("n"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("price") - col("mn")) / ((col("mx") - col("mn")) / nBuckets)),
            lit(nBuckets - 1L))).as("bucket"))
    val sweep = Window.partitionBy(col("bucket"))
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("pm", max(col("size")).over(sweep))
      .filter(col("pm").isNull || col("pm") < col("size"))
    val bucketMax = bucketed.groupBy(col("bucket"))
      .agg(max(col("size")).as("bmax"))
      .withColumn("prev_max",
        max(col("bmax")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    local.join(broadcast(bucketMax.select(col("bucket"), col("prev_max"))), Seq("bucket"))
      .filter(col("prev_max").isNull || col("prev_max") < col("size"))
      .select(col("price"), col("size"), col("n"))
      .orderBy(col("price"), col("size"))
  }

  // ---- queries -------------------------------------------------------------

  val qSkyline = GraftQuery(
    "q151_skyline",
    (s, dir) => skyline(Tables.part(s, dir), "p_retailprice", "p_size"),
    Some("""
      WITH pts AS (
        SELECT p_retailprice AS price, p_size AS size, count(*) AS n
        FROM part
        WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
        GROUP BY 1, 2),
      s AS (
        SELECT price, size, n,
               max(size) OVER (ORDER BY price ASC, size DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM pts)
      SELECT price, size, n
      FROM s WHERE pm IS NULL OR pm < size
      ORDER BY price, size"""))

  val queries: Seq[GraftQuery] = Seq(qSkyline)
}
