package graft.vector

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int, labels: Int) =
    (1 to n).map(i => (i.toLong, Seq(1f, 0f), i % labels))
      .toDF("vec_id", "embedding", "label")

  test("negatives never share the anchor's label and draws are deterministic") {
    val embs = df(100, labels = 4)
    val a = NegativeSampling.sampleNegatives(embs, poolSize = 16, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val b = NegativeSampling.sampleNegatives(embs, poolSize = 16, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    a.foreach { case (anchor, rank, negId, negLabel) =>
      assert(negLabel != (anchor % 4), s"anchor $anchor drew own-label $negId")
      assert(rank >= 1 && rank <= 3)
      assert(negId != anchor)
    }
    // every anchor with >= 3 cross-label pool candidates draws exactly 3
    val perAnchor = a.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ == 3))
  }

  test("an anchor whose label covers the pool draws nothing") {
    // all vectors share label 0 -> no cross-label candidate exists
    val embs = df(20, labels = 1)
    assert(NegativeSampling.sampleNegatives(embs, 8, 2).count() == 0)
  }
}
