package graft.vector

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("semantic dedup: exact twins collapse to the lower id, others survive") {
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f))
    )
    val twins = Seq((10L, Array(1.0f, 0.0f, 0.0f)), (12L, Array(0.0f, 0.0f, 1.0f)))
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(emb, nClusters = 2, tau = 0.999)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L, 10L, 12L))
    val kept = out.filter(_._4).map(_._1).toSet
    // exact twins: identical cent_sim -> id tiebreak keeps the original
    assert(!kept.contains(10L) && kept.contains(0L))
    assert(!kept.contains(12L) && kept.contains(2L))
    // orthogonal-ish vectors survive a 0.999 threshold
    assert(Set(1L, 3L).subsetOf(kept))
  }

  test("semantic dedup: within a dup group the farthest-from-centroid wins") {
    // one tight cluster: a and b are near-identical; c pulls the centroid;
    // the member with LOWER centroid similarity has priority
    val emb = Seq(
      (1L, Array(1.0f, 0.00f)),
      (2L, Array(1.0f, 0.02f)), // near-twin of 1
      (3L, Array(0.9f, 0.45f))  // same cluster, far enough to survive
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(emb, nClusters = 1, tau = 0.999)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out(3L)._2) // survives: cos(1,3) and cos(2,3) < 0.999
    // exactly one of the twins survives — the one with smaller cent_sim
    val (s1, k1) = out(1L); val (s2, k2) = out(2L)
    assert(k1 != k2)
    assert(if (s1 < s2) k1 else if (s2 < s1) k2 else k1)
    intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(emb, nClusters = 0, tau = 0.999)
    }
    intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(emb, nClusters = 1, tau = 1.5)
    }
  }
}
