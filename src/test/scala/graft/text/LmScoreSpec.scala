package graft.text

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of the engine's term arithmetic: round(-ln p, 8) accumulated
    * exactly, then round(sum / n, 6).
    */
  private def term(cbg: Long, cw: Long, v: Long): BigDecimal =
    BigDecimal(-math.log((cbg + 1).toDouble / (cw + v).toDouble))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)

  private def avg(terms: Seq[BigDecimal]): Double =
    BigDecimal(terms.sum.toDouble / terms.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bigram LM score: hand-computed add-one smoothed values") {
    // corpus: c(a)=3, c(b)=2, V=2; c("a b")=2, c("b a")=1
    val docs = Seq((1L, "a b"), (2L, "a b a")).toDF("doc_id", "text")
    val out = LmScore.bigramLmScore(docs)
      .as[(Long, Long, Double)].collect().toSeq
    val ab = term(cbg = 2, cw = 3, v = 2) // -ln(3/5)
    val ba = term(cbg = 1, cw = 2, v = 2) // -ln(2/4)
    assert(out == Seq(
      (1L, 1L, avg(Seq(ab))),
      (2L, 2L, avg(Seq(ab, ba)))))
  }

  test("bigram LM score: single-token docs are excluded, repeated text scores low") {
    val docs = Seq(
      (1L, "solo"),
      (2L, "x y x y x y x y"),
      (3L, "x q")
    ).toDF("doc_id", "text")
    val out = LmScore.bigramLmScore(docs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 3L))
    val byDoc = out.map(r => r._1 -> r._3).toMap
    // "x y"/"y x" transitions dominate the corpus -> doc 2 scores lower
    // (more probable) than the one-off "x q" transition in doc 3
    assert(byDoc(2L) < byDoc(3L))
    assert(out.find(_._1 == 2L).get._2 == 7L)
  }
}
