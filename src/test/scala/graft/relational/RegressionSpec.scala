package graft.relational

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("group regression: exact line is recovered with r2 = 1") {
    // y = 2x + 1 exactly — closed form must return slope 2, intercept 1
    val df = (1 to 10).map(i => ("a", i.toDouble, 2.0 * i + 1.0))
      .toDF("g", "x", "y")
    val out = Regression.groupRegression(df, "g", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 1)
    val (g, n, slope, intercept, r2) = out.head
    assert(g == "a" && n == 10L)
    assert(math.abs(slope - 2.0) < 1e-12)
    assert(math.abs(intercept - 1.0) < 1e-12)
    assert(math.abs(r2 - 1.0) < 1e-12)
  }

  test("group regression: hand-computed sufficient statistics") {
    // points (1,2),(2,3),(3,5): sx=6 sy=10 sxx=14 sxy=23 syy=38, n=3
    // slope = (3·23−6·10)/(3·14−36) = 9/6 = 1.5
    // intercept = (10 − 1.5·6)/3 = 1/3
    // r2 = 81 / (6·(3·38−100)) = 81/84
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 3.0), ("a", 3.0, 5.0))
      .toDF("g", "x", "y")
    val (_, n, slope, intercept, r2) = Regression.groupRegression(df, "g", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(n == 3L)
    assert(slope == 1.5)
    assert(math.abs(intercept - 1.0 / 3.0) < 1e-15)
    assert(math.abs(r2 - 81.0 / 84.0) < 1e-15)
  }

  test("group regression: independent groups fit independently") {
    val df = ((1 to 5).map(i => ("up", i.toDouble, i.toDouble)) ++
      (1 to 5).map(i => ("down", i.toDouble, -i.toDouble))).toDF("g", "x", "y")
    val out = Regression.groupRegression(df, "g", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(out("up") - 1.0) < 1e-12)
    assert(math.abs(out("down") + 1.0) < 1e-12)
  }
}
