package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals: planted repeats produce the exact fractions") {
    val docs = Seq(
      (1L, "a a a a"),        // 4 tokens, 1 distinct; 3x bigram "a a"; 2x trigram
      (2L, "w x y z"),        // all unique
      (3L, "solo"),           // 1 token: no bigrams/trigrams, guards hold
      (4L, "p q"),            // 2 tokens: exactly one bigram, no trigram —
                              // the n_bigrams = n_tokens − 1 boundary of the
                              // aggregate-derived bigram stats
      (5L, "")                // empty text: tokenizes to [""] (1 token)
    ).toDF("doc_id", "text")
    val out = Repetition.repetitionSignals(docs)
      .as[(Long, Int, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4, 0.75, 1.0 - 1.0 / 3, 0.5, 1.0),
      (2L, 4, 0.0, 0.0, 0.0, 1.0 / 3), // 3 distinct bigrams, each count 1
      (3L, 1, 0.0, 0.0, 0.0, 0.0),
      (4L, 2, 0.0, 0.0, 0.0, 1.0),
      (5L, 1, 0.0, 0.0, 0.0, 0.0)))
  }

  test("token entropy: 0 for degenerate, ln(n) for all-distinct") {
    val docs = Seq(
      (1L, "a a a a"),      // single symbol: H = 0
      (2L, "w x y z"),      // uniform over 4: H = ln 4
      (3L, "a a b b")       // uniform over 2: H = ln 2
    ).toDF("doc_id", "text")
    val out = Repetition.tokenEntropy(docs)
      .as[(Long, Long, Double)].collect().toSeq
    def h(ps: Seq[Double]): Double =
      ps.map(p => BigDecimal(-p * math.log(p))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(out == Seq(
      (1L, 4L, h(Seq(1.0))),
      (2L, 4L, h(Seq(0.25, 0.25, 0.25, 0.25))),
      (3L, 4L, h(Seq(0.5, 0.5)))))
  }

  test("stoplist removal: top-k by doc-frequency, lexicographic tiebreak") {
    // df: zz in 3 docs; aa and bb in 2 docs each (tie -> aa wins slot 2);
    // cc/dd/ee singletons
    val docs = Seq(
      (1L, "zz aa cc zz"),
      (2L, "zz bb aa dd"),
      (3L, "bb zz ee")
    ).toDF("doc_id", "text")
    val out = Repetition.removeTopTokens(docs, k = 2)
      .as[(Long, String, Int)].collect().toSeq
    // stoplist = {zz, aa}; bb survives the tie
    assert(out == Seq(
      (1L, "cc", 3),
      (2L, "bb dd", 2),
      (3L, "bb ee", 1)))
    // a doc made entirely of stoplist tokens becomes the empty string
    val all = Seq((1L, "zz zz"), (2L, "zz aa"), (3L, "aa q")).toDF("doc_id", "text")
    val cleaned = Repetition.removeTopTokens(all, k = 2)
      .as[(Long, String, Int)].collect().toSeq
    assert(cleaned == Seq((1L, "", 2), (2L, "", 2), (3L, "q", 1)))
    intercept[IllegalArgumentException] { Repetition.removeTopTokens(docs, k = 0) }
  }
}
