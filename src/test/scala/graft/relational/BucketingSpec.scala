package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with ZERO shuffle exchanges (broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Bucketing.bucketedJoin(spark, dir).queryExecution.sparkPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(smj.nonEmpty, s"expected a sort-merge join over bucket scans:\n$plan")
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed layout is semantics-neutral: result equals the raw-table join") {
    val bucketed = Bucketing.revenueByPriority(spark, dir).collect()
    val raw = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(bucketed.toSeq === raw.toSeq)
  }

  test("bucket count scales with input: floored at writer parallelism, grows with bytes") {
    val n = Bucketing.numBucketsFor(spark, dir)
    assert(n >= Bucketing.MinBuckets)
    assert(n >= spark.sparkContext.defaultParallelism,
      s"bucket count $n must not pin the later bucketed join below core count")
    assert((n & (n - 1)) === 0, s"bucket count $n must be a power of two")
    assert(n <= Bucketing.MaxBuckets)
    // bytes-driven growth: a synthetic size far above target forces more
    // buckets than the parallelism floor alone
    val need = math.max((100L << 30) / Bucketing.TargetBucketBytes + 1,
      spark.sparkContext.defaultParallelism.toLong)
    var expect = Bucketing.MinBuckets
    while (expect < need && expect < Bucketing.MaxBuckets) expect <<= 1
    assert(expect > spark.sparkContext.defaultParallelism,
      "a 100 GiB fact must size buckets past the core floor")
  }

  test("ensureBucketed is idempotent and returns stable catalog names") {
    val first = Bucketing.ensureBucketed(spark, dir)
    val second = Bucketing.ensureBucketed(spark, dir)
    assert(first === second)
    assert(spark.catalog.tableExists(first._1))
    assert(spark.catalog.tableExists(first._2))
  }
}
