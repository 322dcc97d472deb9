package graft.text

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("readability: hand-computed counts and Flesch score") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences
      (2L, "word"), // 1 word, no terminator → sentences floors at 1
      (3L, "!!!")) // no words → dropped
      .toDF("doc_id", "text")
    val out = Readability.readabilityScores(docs)
      .as[(Long, Int, Int, Int, Double)].collect()
      .map { case (id, w, s, sy, f) => id -> ((w, s, sy, f)) }.toMap
    assert(out.keySet === Set(1L, 2L))
    val (w1, s1, sy1, f1) = out(1L)
    // the cat sat the dog ran → vowel groups: e, a, a, e, o, a = 6
    assert((w1, s1, sy1) === (6, 2, 6))
    assert(f1 === 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
    val (w2, s2, sy2, f2) = out(2L)
    assert((w2, s2, sy2) === (1, 1, 1))
    assert(f2 === 206.835 - 1.015 * 1.0 - 84.6 * 1.0)
  }

  test("readability: syllable heuristic counts vowel RUNS, not vowels") {
    val docs = Seq((1L, "queue beautiful")).toDF("doc_id", "text")
    // queue → "ueue" is one run; beautiful → eau, i, u = 3 runs
    val out = Readability.readabilityScores(docs)
      .select("n_syllables").as[Int].collect()
    assert(out.toSeq === Seq(4))
  }
}
