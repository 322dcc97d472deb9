package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OlapSpec extends SparkSpec {
  import spark.implicits._

  test("rollup: subtotal and grand-total rows with Postgres-style grouping bits") {
    val li = Seq(
      ("A", "x", 1.0, 10.0), ("A", "y", 2.0, 20.0), ("B", "x", 3.0, 30.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val out = Olap.rollupSummary(li)
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n_rows")
      .as[(Long, String, String, Double, Long)].collect().toSet
    assert(out === Set(
      (0L, "A", "x", 1.0, 1L), (0L, "A", "y", 2.0, 1L), (0L, "B", "x", 3.0, 1L),
      (1L, "A", null, 3.0, 2L), (1L, "B", null, 3.0, 1L), // status rolled up → bit 0
      (3L, null, null, 6.0, 3L))) // both rolled up → grand total
  }

  test("pivot: absent (status, priority) combinations are 0, not null") {
    val orders = Seq(("O", "1-URGENT"), ("O", "1-URGENT"), ("F", "5-LOW"))
      .toDF("o_orderstatus", "o_orderpriority")
    val out = Olap.pivotPriorityCounts(orders)
      .select("o_orderstatus", "p1_urgent", "p5_low", "p3_medium")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(("O", 2L, 0L, 0L), ("F", 0L, 1L, 0L)))
  }

  test("pivot construction runs no Spark job (explicit values skip the distinct collect)") {
    // Spark's pivot(col) overload runs a driver-side distinct to discover
    // columns — a hidden job and unbounded driver payload. Pin that our
    // explicit-values call stays lazy (the q26-style listener sentinel).
    // pre-load so the parquet listing/schema job isn't attributed to pivot
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Olap.pivotPriorityCounts(orders)
      spark.sparkContext.parallelize(Seq(1), 1).count() // ordered-delivery sentinel
      val deadline = System.currentTimeMillis() + 30000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(jobs.get() == 1,
        s"pivot construction submitted ${jobs.get() - 1} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("histogram: edges land in the right buckets, max folds into the last") {
    val df = Seq(0.0, 1.0, 2.5, 9.999, 10.0).toDF("v") // range [0, 10], 4 buckets of 2.5
    val out = Olap.histogram(df, "v", nBuckets = 4)
      .select("bucket", "n").as[(Int, Long)].collect().toMap
    assert(out === Map(0 -> 2L, 1 -> 1L, 3 -> 2L)) // 10.0 clamps to bucket 3
  }
}
