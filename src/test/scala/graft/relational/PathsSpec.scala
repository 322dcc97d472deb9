package graft.relational

import graft.SparkSpec

class PathsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("bfs: hop distances on a path graph, cut off at k") {
    // 1 - 2 - 3 - 4 - 5, seed {1}, 3 hops
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = Paths.bfsHops(edges, Seq(1L).toDF("node"), hops = 3)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 5 unreached in 3 hops
  }

  test("bfs: min distance wins when multiple seeds/paths reach a node") {
    // triangle 1-2-3 plus tail 3-4; seeds {1, 4}
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val out = Paths.bfsHops(edges, Seq(1L, 4L).toDF("node"), hops = 2)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0)) // 3 via 4 beats 1→2→3
  }

  test("bfs: duplicate seed rows collapse (distinct), dist stays 0") {
    val edges = sym((1L, 2L))
    val out = Paths.bfsHops(edges, Seq(1L, 1L, 1L).toDF("node"), hops = 1)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1))
  }
}
