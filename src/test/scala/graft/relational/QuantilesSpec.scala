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

  test("approx quantile gate: exact quantiles right, sketch inside bounds") {
    // 1..1000 in one group: exact p50 = value at rank ceil(0.5*1000) = 500
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("grp", "v")
    val out = Quantiles.approxQuantileGate(df, "grp", "v",
      accuracy = 10000, slack = 4)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(out.map(r => r._2 -> r._3).toMap ==
      Map("p50" -> 500L, "p90" -> 900L, "p99" -> 990L))
    assert(out.forall(_._4), s"sketch outside rank bounds: $out")
    // the sketch side must not change the exact side whatever the
    // partitioning (merge-order independence of the dumped columns)
    val repart = Quantiles.approxQuantileGate(df.repartition(11), "grp", "v",
      accuracy = 10000, slack = 4)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(repart.map(r => (r._1, r._2, r._3)) == out.map(r => (r._1, r._2, r._3)))
    assert(repart.forall(_._4))
  }

  test("mad outliers: median/MAD exact, only >z·MAD rows flagged") {
    // group a: 1..9 plus an extreme 1000 -> med is rank ceil(10/2)=5 -> 5.0;
    // deviations {4,3,2,1,0,1,2,3,4,995} -> sorted {0,1,1,2,2,3,3,4,4,995},
    // MAD = rank-5 value = 2.0; threshold 6.0 -> only 1000 (dev 995) flagged
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a" -> 1000.0))
      .toDF("g", "v")
    val out = Quantiles.madOutlierStats(df, "g", "v", z = 3.0)
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 5.0, 2.0, 10L, 1L)))
  }

  test("mad outliers: constant group has MAD 0 and flags any deviation") {
    val df = (Seq.fill(5)(("c", 7.0)) :+ ("c" -> 7.5)).toDF("g", "v")
    // med 7.0, deviations {0 x5, 0.5} -> MAD 0; 7.5 deviates > 0 -> flagged
    val out = Quantiles.madOutlierStats(df, "g", "v", z = 3.0)
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(out == Seq(("c", 7.0, 0.0, 6L, 1L)))
  }

  test("winsorized stats: tails clamp to the exact p05/p95 rank values") {
    // 1..20 in one group: p05 rank ceil(0.05*20)=1 -> 1.0; p95 rank 19 ->
    // 19.0; clipping moves only value 20 -> 19 (one high clip, no low
    // clip: nothing sits BELOW rank-1's value), mean = (sum(1..19)+19)/20
    val df = (1 to 20).map(i => ("a", i.toDouble)).toDF("g", "v")
    val out = Quantiles.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    val expectedMean = ((1 to 19).sum + 19).toDouble / 20
    assert(out == Seq(("a", 20L, 0L, 1L, expectedMean, 1.0, 19.0)))
  }

  test("winsorized stats: single-value group clips nothing") {
    val df = Seq.fill(4)(("b", 3.5)).toDF("g", "v")
    val out = Quantiles.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("b", 4L, 0L, 0L, 3.5, 3.5, 3.5)))
  }

  test("robust stats: all-null group drops, mixed-null group ignores nulls") {
    // group "n" is entirely NULL -> no output row (never an empty-array
    // rank crash); group "m" computes over its non-null values only
    val df = Seq(("n", None), ("n", None), ("m", Some(1.0)), ("m", None),
      ("m", Some(3.0)))
      .toDF("g", "v")
    val mad = Quantiles.madOutlierStats(df, "g", "v", z = 3.0)
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(mad == Seq(("m", 1.0, 0.0, 2L, 1L)))
    val win = Quantiles.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(win == Seq(("m", 2L, 0L, 0L, 2.0, 1.0, 3.0)))
  }

  test("weighted quantiles: weight shifts the median where counts would not") {
    // values 1..4 with weights 1,1,1,7: unweighted median is 2 (type-1
    // over 4 rows: ceil(0.5*4)=2nd value), weighted total=10 ->
    // ceil(0.5*10)=5 first reached at v=4 (cum 1,2,3,10)
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 7L))
      .toDF("g", "v", "wt")
    val out = Quantiles.weightedGroupQuantiles(df, "g", "v", "wt")
      .as[(String, String, Double)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out("p25") == 3.0) // ceil(2.5)=3 -> cum 3 at v=3
    assert(out("p50") == 4.0)
    assert(out("p90") == 4.0)
    // per-value weights merge before the cumulative walk
    val dup = Seq(("a", 1.0, 2L), ("a", 1.0, 3L), ("a", 2.0, 5L))
      .toDF("g", "v", "wt")
    val m = Quantiles.weightedGroupQuantiles(dup, "g", "v", "wt")
      .as[(String, String, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(m("p50") == 1.0) // cum(1.0)=5 >= ceil(5)
  }
}
