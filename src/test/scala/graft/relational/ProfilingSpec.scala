package graft.relational

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports exact counts, nulls, distincts, and bounds per column") {
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.0), None),
      (Some(2.0), Some(30.0)),
      (None, Some(10.0)))
      .toDF("a", "b")
    val out = Profiling.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 1L, 2L, Some(1.0), Some(2.0))))
    assert(out("b") == (("b", 4L, 1L, 2L, Some(10.0), Some(30.0))))
  }

  test("an all-null column profiles with null bounds, not an error") {
    val df = Seq((None: Option[Double], 1.0), (None, 2.0)).toDF("a", "b")
    val out = Profiling.profile(df, Seq("a"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(out == (("a", 2L, 2L, 0L, None, None)))
  }

  test("each column profiles through its own pruned scan, not one Expand") {
    val plan = Profiling.profile(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Seq("l_quantity", "l_extendedprice"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"multi-count-distinct Expand in:\n$plan")
  }
}
