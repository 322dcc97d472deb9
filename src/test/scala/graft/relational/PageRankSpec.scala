package graft.relational

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric unweighted triangle is uniform, hub dominates a star") {
    // triangle: all nodes equivalent -> equal scores
    val tri = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (1L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val triPr = PageRank.pageRank(tri).as[(Long, Double)].collect().toMap
    assert(triPr.values.toSet.size == 1)
    assert(math.abs(triPr.values.sum - 1.0) < 1e-6)

    // star: center linked to 4 leaves -> center scores highest
    val star = (2L to 5L).flatMap(l => Seq((1L, l, 1L), (l, 1L, 1L)))
      .toDF("src", "dst", "w")
    val starPr = PageRank.pageRank(star).as[(Long, Double)].collect().toMap
    assert((2L to 5L).forall(l => starPr(1L) > starPr(l)))
    assert((2L to 5L).map(starPr).toSet.size == 1) // leaves symmetric
    intercept[IllegalArgumentException] { PageRank.pageRank(star, iters = 0) }
  }

  test("pagerank: weights steer mass toward the heavier edge") {
    // node 1 splits rank between 2 (w=9) and 3 (w=1)
    val g = Seq((1L, 2L, 9L), (2L, 1L, 9L), (1L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val pr = PageRank.pageRank(g).as[(Long, Double)].collect().toMap
    assert(pr(2L) > pr(3L))
  }
}
