package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential + edge pinning for the bucketed distributed skyline:
  * the two-phase (local sweep + cross-bucket prune) result must equal the
  * brute-force dominance definition whatever the bucket boundaries cut.
  */
class SkylineSpec extends SparkSpec {

  /** Brute-force skyline on distinct (price, size) pairs: p survives iff
    * no q != p has (q.price <= p.price && q.size >= p.size).
    */
  private def brute(pts: Seq[(Double, Int)]): Set[(Double, Int)] = {
    val d = pts.distinct
    d.filter { case (p, s) =>
      !d.exists { case (qp, qs) => (qp, qs) != (p, s) && qp <= p && qs >= s }
    }.toSet
  }

  private def run(pts: Seq[(Double, Int)], nBuckets: Int = 32): Set[(Double, Int)] = {
    import spark.implicits._
    Skyline.skyline(pts.toDF("p_retailprice", "p_size"),
        "p_retailprice", "p_size", nBuckets)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
  }

  test("differential: bucketed skyline equals brute-force dominance (random points)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val pts = Seq.fill(120)((math.floor(rnd.nextDouble() * 500) / 10.0, rnd.nextInt(20)))
      assert(run(pts) === brute(pts), s"trial $trial")
      assert(run(pts, nBuckets = 1) === brute(pts), s"trial $trial, single bucket")
      assert(run(pts, nBuckets = 120) === brute(pts), s"trial $trial, bucket-per-point")
    }
  }

  test("planted frontier: strictly-better points eliminate the rest") {
    // frontier: cheaper is smaller — (1.0, 5), (2.0, 8), (3.0, 9);
    // dominated: (2.5, 7) by (2.0,8); (3.0, 9) duplicated keeps n=2
    val pts = Seq((1.0, 5), (2.0, 8), (2.5, 7), (3.0, 9), (3.0, 9))
    assert(run(pts) === Set((1.0, 5), (2.0, 8), (3.0, 9)))
    import spark.implicits._
    val n = Skyline.skyline(pts.toDF("p_retailprice", "p_size"),
        "p_retailprice", "p_size")
      .filter(col("price") === 3.0).head().getLong(2)
    assert(n === 2L) // member count of the duplicated frontier point
  }

  test("degenerate shapes: single point, all-equal prices, empty input") {
    assert(run(Seq((4.2, 3))) === Set((4.2, 3)))
    // mx == mn exercises the zero-width bucket guard
    assert(run(Seq((1.0, 1), (1.0, 5), (1.0, 3))) === Set((1.0, 5)))
    assert(run(Seq.empty[(Double, Int)]) === Set.empty)
  }

  test("same-price ties: only the max size at a price can survive") {
    // (2.0, 9) dominates (2.0, 4); (1.0, 9) then dominates (2.0, 9)
    assert(run(Seq((2.0, 9), (2.0, 4), (1.0, 9))) === Set((1.0, 9)))
  }
}
