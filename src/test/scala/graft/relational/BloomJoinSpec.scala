package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered join equals the plain join exactly") {
    val fact = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "v")
    val dim = Seq((3L, "a"), (5L, "b"), (96L, "c")).toDF("k", "name")
    val got = BloomJoin.bloomPrefilteredJoin(fact, dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val want = fact.join(dim, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("the prefilter actually prunes non-matching fact rows pre-join") {
    val fact = (1L to 10000L).map(i => (i, i)).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    // count rows surviving JUST the bloom stage (before the exact join)
    val bloomAgg = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(xxhash64(col("k"))),
        org.apache.spark.sql.catalyst.expressions.Literal(1000000L))
        .toAggregateExpression())
    val bloomPlan = dim.agg(bloomAgg.as("bf")).queryExecution.analyzed
    val pruned = fact
      .where(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomPlan),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(xxhash64(col("k"))))))
      .count()
    // no false negatives (>= 2 matches survive), massive pruning (far
    // below the 10k input; fp-rate at this sizing is ~0)
    assert(pruned >= 2 && pruned < 100)
    intercept[IllegalArgumentException] {
      BloomJoin.bloomPrefilteredJoin(fact, dim, "k", expectedItems = 0)
    }
  }
}
