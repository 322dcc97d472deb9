package graft.vector

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("centroid outliers: planted far vector is flagged, near ones are not") {
    // 7 vectors near the origin, one far away on both axes
    val near = (0 until 7).map(i => (i.toLong, Array(0.1f * (i % 3), -0.1f * (i % 2)), i % 2))
    val far = Seq((7L, Array(25.0f, -25.0f), 0))
    val emb = (near ++ far).toDF("vec_id", "embedding", "label")
    val out = Outliers.centroidOutliers(emb, zThreshold = 2.0)
      .as[(Long, Int, Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) == (0L to 7L))
    val flagged = out.filter(_._5).map(_._1)
    assert(flagged == Seq(7L))
    // the far vector's distance dominates every other
    val d = out.map(r => r._1 -> r._3).toMap
    // the centroid itself is dragged toward the planted point, so the
    // near/far distance ratio is ~6x, not the naive 250x
    assert((0L to 6L).forall(i => d(i) < d(7L) / 4))
  }

  test("centroid outliers: distances are exact for a hand-computed centroid") {
    // centroid of (0,0), (2,0), (0,2), (2,2) is (1,1); every corner is
    // sqrt(2) away -> all z-scores 0 (zero variance guard: n-1 sd of equal
    // values is 0 -> z is NaN/Inf; use unequal dists instead)
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(4.0f, 0.0f), 0),
      (2L, Array(0.0f, 4.0f), 0),
      (3L, Array(1.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Outliers.centroidOutliers(emb).as[(Long, Int, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r._3).toMap
    // centroid = (1.25, 1.25)
    def expect(x: Double, y: Double): Double =
      BigDecimal(math.sqrt((x - 1.25) * (x - 1.25) * 1e12 + (y - 1.25) * (y - 1.25) * 1e12) / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) == expect(0, 0))
    assert(out(1L) == expect(4, 0))
    assert(out(3L) == expect(1, 1))
  }
}
