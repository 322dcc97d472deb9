package graft.vector

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def df(vecs: Seq[Seq[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")

  test("covariance matches hand math on a 2-d fixture") {
    // x = (1,2,3), y = (2,4,6): var(x)=1, var(y)=4, cov(x,y)=2 (ddof=1)
    val out = Pca.covarianceMatrix(df(Seq(
      Seq(1f, 2f), Seq(2f, 4f), Seq(3f, 6f))))
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(out.size == 3) // upper triangle of 2x2
    assert(math.abs(out((1L, 1L)) - 1.0) < 1e-9)
    assert(math.abs(out((1L, 2L)) - 2.0) < 1e-9)
    assert(math.abs(out((2L, 2L)) - 4.0) < 1e-9)
  }

  test("covariance is exactly symmetric-complete: d(d+1)/2 rows, i <= j") {
    val rows = Pca.covarianceMatrix(df(Seq(
      Seq(1f, 0f, 2f), Seq(0f, 1f, 1f), Seq(2f, 2f, 0f), Seq(1f, 1f, 1f))))
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.size == 6)
    assert(rows.forall { case (i, j, _) => i <= j && i >= 1 && j <= 3 })
  }

  test("gram aggregate matches the composable pair-explode form exactly") {
    val vecs = (0 until 50).map { k =>
      Seq.tabulate(5)(j => (((k * 31 + j * 17) % 19) - 9) / 10.0f)
    }
    val fast = Pca.covarianceMatrix(df(vecs))
      .as[(Long, Long, Double)].collect().toSeq
    val ref = Pca.covarianceMatrixComposable(df(vecs))
      .as[(Long, Long, Double)].collect().toSeq
    assert(fast == ref) // exact long sums -> bit-identical covariance
    assert(fast.size == 15)
  }

  test("power iteration recovers a planted dominant direction") {
    // points spread along (3,4)/5 with tiny isotropic noise: the top
    // component must align with the planted axis
    val dir = Array(0.6, 0.8)
    val vecs = (0 until 200).map { k =>
      val t = (k - 100) / 100.0 // spread in [-1, 1)
      val eps = ((k * 37) % 11 - 5) / 1000.0 // deterministic tiny noise
      Seq((t * dir(0) + eps * dir(1)).toFloat,
        (t * dir(1) - eps * dir(0)).toFloat)
    }
    val pc = Pca.topComponentOf(df(vecs))
    val dot = math.abs(pc(0) * dir(0) + pc(1) * dir(1))
    assert(dot > 0.999, s"top component ${pc.toSeq} not aligned with planted $dir")
  }

  test("topComponent fixes the sign deterministically") {
    // diag(4, 1): eigenvector is ±e1; the convention picks the positive one
    val pc = Pca.topComponent(Seq((1, 1, 4.0), (1, 2, 0.0), (2, 2, 1.0)), dim = 2)
    assert(pc(0) > 0.999 && math.abs(pc(1)) < 1e-6)
  }
}
