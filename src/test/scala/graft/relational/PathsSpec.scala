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

  test("bfs frontier-delta: identical to relax form on a planted path + early exit") {
    // planted path 1-2-3-4-5-6 with hops > diameter: the frontier form
    // must short-circuit once the frontier empties AND still agree exactly
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val seeds = Seq(1L).toDF("node")
    val relax = Paths.bfsHops(edges, seeds, hops = 9)
      .as[(Long, Int)].collect().toMap
    val delta = Paths.bfsHops(edges, seeds, hops = 9, frontier = true)
      .as[(Long, Int)].collect().toMap
    assert(delta === relax)
    assert(delta === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 5))
  }

  test("bfs frontier-delta: differential vs relax on a random graph, multi-seed") {
    val rnd = new scala.util.Random(20260813)
    val n = 60
    val pairs = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(p => p._1 != p._2)
    val edges = sym(pairs: _*)
    val seeds = Seq(0L, 7L, 13L).toDF("node")
    (1 to 4).foreach { h =>
      val relax = Paths.bfsHops(edges, seeds, hops = h)
        .as[(Long, Int)].collect().toMap
      val delta = Paths.bfsHops(edges, seeds, hops = h, frontier = true)
        .as[(Long, Int)].collect().toMap
      assert(delta === relax, s"frontier diverged from relax at hops=$h")
    }
  }
}
