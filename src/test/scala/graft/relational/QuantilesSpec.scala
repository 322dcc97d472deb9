package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("group quantiles: discrete quantile = smallest value at rank ceil(q*n)") {
    // group a: values 1..10 → p50 = 5 (rank 5), p90 = 9, p99 = 10
    // group b: single value → all probes hit it
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ ("b" -> 42.0))
      .toDF("g", "v")
    val out = Quantiles.groupQuantiles(df, "g", "v")
      .select("g", "probe", "quantile").as[(String, String, Double)]
      .collect().toSet
    assert(out === Set(
      ("a", "p50", 5.0), ("a", "p90", 9.0), ("a", "p99", 10.0),
      ("b", "p50", 42.0), ("b", "p90", 42.0), ("b", "p99", 42.0)))
  }

  test("group quantiles: duplicate-heavy values weight the rank correctly") {
    // 9x value 1.0 + 1x value 2.0: p50 rank 5 → 1.0, p99 rank 10 → 2.0
    val df = (Seq.fill(9)(1.0) :+ 2.0).map(("a", _)).toDF("g", "v")
    val out = Quantiles.groupQuantiles(df, "g", "v")
      .select("probe", "quantile").as[(String, Double)].collect().toMap
    assert(out === Map("p50" -> 1.0, "p90" -> 1.0, "p99" -> 2.0))
  }

  test("group quantiles: windows sit over the aggregated count table, not rows") {
    // the plan's WindowExec input must contain an aggregate below it —
    // the q79 shape; a per-row window would be a hot-group scale bug
    val plan = Quantiles.groupQuantiles(
      graft.Tables.events(spark, "/root/testdata/sf0.001"), "event_type", "value")
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.nonEmpty, s"window over non-aggregated input:\n$w")
    }
  }
}
