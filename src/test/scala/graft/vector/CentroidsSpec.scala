package graft.vector

import graft.SparkSpec

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("class separation: hand-computed centroids and cosines") {
    // label 0: vectors (1,0) and (3,0) -> centroid (2,0)
    // label 1: vectors (0,2) and (0,4) -> centroid (0,3): orthogonal -> 0
    // label 2: (2,0) -> centroid (2,0): parallel to label 0 -> 1
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(3.0f, 0.0f), 0),
      (3L, Seq(0.0f, 2.0f), 1), (4L, Seq(0.0f, 4.0f), 1),
      (5L, Seq(2.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Centroids.classSeparation(embs, dims = 2)
      .as[(Int, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out((0, 1))._5 == 0.0)
    assert(math.abs(out((0, 2))._5 - 1.0) < 1e-12)
    assert(out((0, 1))._3 == 2L && out((0, 1))._4 == 2L)
    assert(out((1, 2))._5 == 0.0)
    assert(out.size == 3)
  }

  test("class separation: zero centroid guard") {
    // label 0's vectors cancel -> centroid (0,0) -> cosine defined as 0
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(-1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Centroids.classSeparation(embs, dims = 2)
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(out.map(_._5) == Seq(0.0))
    intercept[IllegalArgumentException] { Centroids.classSeparation(embs, 0) }
  }
}
