package graft.relational

import graft.SparkSpec

/** Pins q33's type-7 interpolated percentile semantics with hand-computed
  * fixtures, independent of the DuckDB oracle (the r12 sf1 gate showed
  * the oracle alone was not enough: Spark `percentile` and DuckDB
  * `quantile_cont` agree semantically but diverge in the last ulp of the
  * interpolation, so q33 now computes a + (b−a)·f from count-table ranks
  * with an identical op tree in both engines — this spec pins that the
  * rank arithmetic still IS the type-7 percentile).
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]): Map[String, (Double, Double, Double, Double, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("pctl_spec")
    rows.toDF("event_type", "value")
      .withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ExtendedQueries.q33.run(spark, dir.toString)
      .as[(String, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("type-7 interpolation: value at rank p*(n-1), linear between positions") {
    // group a: 1..5. p50: r=0.5*4=2.0 -> exactly position 3 (0-based 2) = 3.0.
    // p90: r=3.6 -> between 4 and 5 at f=0.6 -> 4.6. p99: r=3.96 -> 4.96.
    val out = run((1 to 5).map(i => ("a", i.toDouble)))
    val (p50, p90, p99, vmin, vmax) = out("a")
    assert(p50 == 3.0)
    assert(p90 == 4.0 + (5.0 - 4.0) * (0.9 * 4 - 3))
    assert(p99 == 4.0 + (5.0 - 4.0) * (0.99 * 4 - 3))
    assert(vmin == 1.0 && vmax == 5.0)
  }

  test("duplicates interpolate between POSITIONS of the multiset, not distinct values") {
    // b: [1, 2, 2, 10]. p50: r=1.5 -> between positions 2 and 3 (both 2.0)
    // -> 2.0 (duplicate run: interpolation is a no-op). p90: r=2.7 ->
    // between 2.0 and 10.0 at f=0.7 -> 7.6 (within fp of the literal tree).
    val out = run(Seq(("b", 1.0), ("b", 2.0), ("b", 2.0), ("b", 10.0)))
    val (p50, p90, _, _, _) = out("b")
    assert(p50 == 2.0)
    assert(p90 == 2.0 + (10.0 - 2.0) * (0.9 * 3 - 2))
  }

  test("single-row group: all percentiles collapse to the value") {
    val out = run(Seq(("c", 7.25)))
    assert(out("c") == ((7.25, 7.25, 7.25, 7.25, 7.25)))
  }

  test("matches Spark's own percentile aggregate on a mixed fixture") {
    // differential pin: same semantics as the engine's percentile (which
    // q33 no longer uses for exactness + scale reasons)
    val rows = Seq.tabulate(97)(i => ("d", (i * 37 % 101) / 4.0)) ++
      Seq(("e", 1.0), ("e", 2.0))
    val out = run(rows)
    val exp = rows.toDF("event_type", "value")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.expr("percentile(value, array(0.5, 0.9, 0.99))").as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    for (g <- Seq("d", "e")) {
      val (p50, p90, p99, _, _) = out(g)
      // identical math up to the interpolation op order — allow 1e-12 rel
      Seq(p50, p90, p99).zip(exp(g)).foreach { case (got, want) =>
        assert(math.abs(got - want) <= 1e-12 * math.max(1.0, math.abs(want)),
          s"group $g: got $got want $want")
      }
    }
  }
}
