package graft.relational

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: every unordered node triple with all 3 edges. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if es((a, b)) && es((a, c)) && es((b, c))
    } yield (a, b, c)
    val counts = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> counts.getOrElse(n, 0L)).toMap
  }

  test("triangles: K4, a dangling edge, duplicate/reversed inputs") {
    // K4 on 1-4 (every node in 3 triangles) + edge 4-5 (node 5: 0)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (4L, 2L), (3L, 4L), (4L, 5L))
    val got = Triangles.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == ref(edges))
    assert(got(1L) == 3L && got(5L) == 0L)
  }

  test("triangles: differential vs brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2)
    val got = Triangles.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == ref(edges))
  }
}
