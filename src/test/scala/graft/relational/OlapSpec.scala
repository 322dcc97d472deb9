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

  test("unpivot: one row per (row, measure), key filter applied first") {
    val li = Seq(
      (500L, 1, 10.0, 100.0, 0.1, 0.02),
      (500L, 2, 20.0, 200.0, 0.2, 0.04),
      (501L, 1, 30.0, 300.0, 0.3, 0.06)) // dropped by keyMod
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
    val out = Olap.meltMeasures(li, keyMod = 500L)
      .as[(Long, Int, String, Double)].collect()
    assert(out.length == 8) // 2 surviving rows x 4 measures
    assert(out.take(4).toSeq == Seq( // sorted by (key, line, measure)
      (500L, 1, "l_discount", 0.1), (500L, 1, "l_extendedprice", 100.0),
      (500L, 1, "l_quantity", 10.0), (500L, 1, "l_tax", 0.02)))
    assert(!out.exists(_._1 == 501L))
  }

  test("equi-depth bins: near-equal frequency, all rows of one value share a bucket") {
    // 100 rows of v=1..10 (10 each) in one group, k=5 -> 2 values per bucket
    val rows = for (v <- 1 to 10; _ <- 1 to 10) yield ("A", v.toDouble)
    val li = rows.toDF("l_returnflag", "l_quantity")
    val out = Olap.equidepthHistogram(li, k = 5)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("A", 0L, 20L, 1.0, 2.0), ("A", 1L, 20L, 3.0, 4.0),
      ("A", 2L, 20L, 5.0, 6.0), ("A", 3L, 20L, 7.0, 8.0),
      ("A", 4L, 20L, 9.0, 10.0)))
    // skewed: one value holds 90% of rows -> lands wholly in one bucket
    val skew = (Seq.fill(90)(("B", 5.0)) ++ (1 to 10).map(i => ("B", i + 100.0)))
      .toDF("l_returnflag", "l_quantity")
    val sk = Olap.equidepthHistogram(skew, k = 4)
      .as[(String, Long, Long, Double, Double)].collect()
    val heavy = sk.filter(r => r._4 <= 5.0 && 5.0 <= r._5)
    assert(heavy.length == 1 && heavy.head._3 >= 90L)
  }

  test("grouping sets: exact margins only — no grand total row") {
    val orders = Seq(
      (1L, 10L, "O", 10.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "1-URGENT"),
      (2L, 10L, "O", 20.0, java.sql.Timestamp.valueOf("2020-01-02 00:00:00"), "5-LOW"),
      (3L, 11L, "O", 40.0, java.sql.Timestamp.valueOf("2020-01-03 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = Seq((10L, "a", 1, 0.0, "AUTO"), (11L, "b", 1, 0.0, "BIKE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Olap.segmentPriorityGroupingSets(orders, customer)
      .as[(Option[String], Option[String], Long, Double, Long)]
      .collect().toSeq
    // full cross: gid 0; segment margin: gid 1 (priority rolled up);
    // priority margin: gid 2; and NO gid=3 grand total
    assert(out.filter(_._3 == 0L).toSet == Set(
      (Some("AUTO"), Some("1-URGENT"), 0L, 10.0, 1L),
      (Some("AUTO"), Some("5-LOW"), 0L, 20.0, 1L),
      (Some("BIKE"), Some("1-URGENT"), 0L, 40.0, 1L)))
    assert(out.filter(_._3 == 1L).toSet == Set(
      (Some("AUTO"), None, 1L, 30.0, 2L), (Some("BIKE"), None, 1L, 40.0, 1L)))
    assert(out.filter(_._3 == 2L).toSet == Set(
      (None, Some("1-URGENT"), 2L, 50.0, 2L), (None, Some("5-LOW"), 2L, 20.0, 1L)))
    assert(!out.exists(_._3 == 3L))
  }
}
