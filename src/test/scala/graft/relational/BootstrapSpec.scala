package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ord(key: Long, total: Double) =
    (key, 1L, "O", total, Timestamp.valueOf("2020-01-01 00:00:00"), "1-URGENT")

  private val ordCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  test("bootstrap is deterministic and replicate-complete") {
    val df = (1L to 200L).map(k => ord(k, k.toDouble)).toDF(ordCols: _*)
    val a = Bootstrap.bootstrapMeans(df, reps = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val b = Bootstrap.bootstrapMeans(df, reps = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1) == (0L until 10L))
  }

  test("poisson weights: effective n concentrates near the row count") {
    // Poisson(1) weights sum to ~n per replicate (mean n, sd sqrt(2n));
    // with n=500 every replicate should land within 5 sd
    val df = (1L to 500L).map(k => ord(k, 100.0)).toDF(ordCols: _*)
    val effs = Bootstrap.bootstrapMeans(df, reps = 20)
      .select("n_eff").as[Long].collect()
    val sd5 = 5 * math.sqrt(2 * 500.0)
    assert(effs.forall(e => math.abs(e - 500.0) < sd5),
      s"n_eff out of range: ${effs.toSeq}")
  }

  test("replicate means straddle the true mean and the CI brackets it") {
    val df = (1L to 400L).map(k => ord(k, (k % 100).toDouble)).toDF(ordCols: _*)
    val boot = Bootstrap.bootstrapMeans(df, reps = 40)
    val trueMean = 49.5 // residues 0..99, four of each
    val (lo, hi) = Bootstrap.percentileCi(boot)
    assert(lo < trueMean && trueMean < hi, s"CI [$lo, $hi] misses $trueMean")
    assert(hi - lo < 20.0, s"CI [$lo, $hi] implausibly wide")
  }

  test("percentile CI uses the nearest-rank convention: ceil(q*n)-1, clamped") {
    // 40 known replicate means 1..40: q=0.025 -> ceil(1)-1 = index 0 (the
    // minimum, NOT the 2nd smallest), q=0.975 -> ceil(39)-1 = index 38.
    val boot = (1 to 40).map(i => (i.toLong, 100L, i.toDouble))
      .toDF("b", "n_eff", "boot_mean")
    val (lo, hi) = Bootstrap.percentileCi(boot)
    assert(lo == 1.0, s"lo=$lo, expected the minimum replicate mean")
    assert(hi == 39.0, s"hi=$hi, expected index 38 (ceil(0.975*40)-1)")
    // degenerate single replicate: both bounds clamp to the only value
    val one = Seq((0L, 100L, 7.5)).toDF("b", "n_eff", "boot_mean")
    assert(Bootstrap.percentileCi(one) == ((7.5, 7.5)))
  }

  test("CDF literals are the cumulative Poisson(1) distribution") {
    val probs = Bootstrap.PoissonCdf.map(_.toDouble)
    val expected = Iterator.iterate((math.exp(-1.0), math.exp(-1.0), 1)) {
      case (term, cum, k) => (term / k, cum + term / k, k + 1)
    }.take(7).map(_._2).toSeq
    probs.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-15, s"$got vs $want")
    }
    assert(probs == probs.sorted && probs.last < 1.0)
  }
}
