package graft.relational

import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  private def sym(es: Seq[(Long, Long, Long)]) =
    (es ++ es.map(e => (e._2, e._1, e._3))).toDF("src", "dst", "w")

  test("label propagation: two cliques joined by a weak bridge separate") {
    // clique A = {1,2,3}, clique B = {10,11,12}, bridge 3-10 with w=1
    val clique = (ns: Seq[Long]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b, 5L)
    val edges = sym(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L))
      :+ (3L, 10L, 1L))
    val out = Communities.labelPropagation(edges)
      .as[(Long, Long)].collect().toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(1L) != out(10L))
    intercept[IllegalArgumentException] {
      Communities.labelPropagation(edges, iters = 0)
    }
  }

  test("label propagation: tie-break picks the smallest label deterministically") {
    // node 5 sits between equal-weight neighbors 1 and 9
    val edges = sym(Seq((1L, 5L, 2L), (9L, 5L, 2L)))
    val out = Communities.labelPropagation(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(out(5L) == 1L) // min label wins the tie
  }
}
