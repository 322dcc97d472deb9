package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-prefiltered equi-join — the manual form of Spark's runtime
  * row-level filtering (InjectRuntimeFilter): aggregate the dim side's join
  * keys into a bloom filter (Spark's native BloomFilterAggregate, the same
  * sketch the optimizer injects), broadcast the one-row sketch, and drop
  * fact rows that cannot match BEFORE the join's shuffle.
  *
  * Why it matters at 100 TB: the shuffle is the bottleneck of a selective
  * fact⋈dim join — a bloom pass converts it from O(fact) to O(matching
  * fact ± false positives) shuffled rows for one narrow map over the fact
  * side. Correctness never depends on the sketch: blooms have no false
  * NEGATIVES, and the exact join still runs behind the prefilter — which
  * is precisely what makes the operator oracle-able against a plain join.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `key`, bloom-pruning the fact side
    * first. `expectedItems` sizes the sketch (Spark caps bits via its conf;
    * false-positive rate only affects how much the prefilter saves).
    */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
                           expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(key))),
        Literal(expectedItems)).toAggregateExpression())
    // might_contain requires the sketch as a constant or scalar subquery —
    // the same wiring InjectRuntimeFilter emits: the subquery runs once and
    // its one-row result is inlined into the fact-side filter.
    val bloomPlan = dim.agg(bloomAgg.as("bf")).queryExecution.analyzed
    fact
      .where(ColumnBridge.column(BloomFilterMightContain(
        ScalarSubquery(bloomPlan),
        ColumnBridge.expression(xxhash64(col(key))))))
      .join(dim, Seq(key))
  }

  // ---- queries -------------------------------------------------------------

  /** q78: lineitem pruned by a bloom over the high-value orders before the
    * exact join; the oracle is the PLAIN join — bit-identical results are
    * the point (the sketch only prunes).
    */
  val qBloomJoin = GraftQuery(
    "q78_bloom_join",
    (s, dir) => {
      val dim = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      // the filtered dim is O(thousands) of orders at bench SF — size the
      // sketch accordingly instead of inlining the 1 MB default into every task
      bloomPrefilteredJoin(Tables.lineitem(s, dir), dim, "l_orderkey",
        expectedItems = 100000L)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(GraftQuery.DEC)).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"),
          max(col("o_totalprice")).as("o_totalprice"))
        .orderBy(col("l_orderkey"))
    },
    Some(s"""
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS ${GraftQuery.DEC})) AS DOUBLE) AS sum_qty,
             count(*) AS n_items,
             max(o_totalprice) AS o_totalprice
      FROM lineitem
      JOIN (SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice > 400000) o
        ON l_orderkey = o_orderkey
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""))

  val queries: Seq[GraftQuery] = Seq(qBloomJoin)
}
