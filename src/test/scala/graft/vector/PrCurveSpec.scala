package graft.vector

import graft.SparkSpec

class PrCurveSpec extends SparkSpec {
  import spark.implicits._

  test("curve matches hand math on a separable 2-d fixture") {
    // class 0 along +x, class 1 along -x: centroid(0) = (1, 0);
    // cosine scores: class-0 vecs -> 1.0, class-1 vecs -> -1.0
    val embs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0),
      (3L, Seq(-1f, 0f), 1), (4L, Seq(-3f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = PrCurve.prCurve(embs, targetLabel = 0, dims = 2)
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1.0, 2L, 0L, 1.0, 1.0),    // threshold 1.0: both positives, clean
      (-1.0, 2L, 2L, 0.5, 1.0)))  // admit everything: precision halves
  }

  test("recall is monotone nonincreasing as the threshold rises; tp+fp cumulative") {
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = PrCurve.prCurve(embs, targetLabel = 0, dims = 64)
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // rows come threshold-descending: tp, fp, recall all nondecreasing
    rows.sliding(2).foreach {
      case Seq(hi, lo) =>
        assert(hi._1 > lo._1)
        assert(lo._2 >= hi._2 && lo._3 >= hi._3 && lo._5 >= hi._5)
      case _ =>
    }
    // the loosest threshold admits everything: recall 1
    assert(math.abs(rows.last._5 - 1.0) < 1e-9)
  }
}
