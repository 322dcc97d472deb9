package graft.text

import graft.SparkSpec

class SftPairsSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("pairs split at the token boundary with the instruction prefix") {
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val out = SftPairs.sftPairs(
      Seq((1L, words, "en", "s", 0L)).toDF(cols: _*),
      promptTok = 4, completionTok = 8)
      .as[(Long, String, String, String, Long, Boolean)].collect().head
    assert(out._3 == "Summarize: w1 w2 w3 w4")
    assert(out._4 == "w5 w6 w7 w8 w9 w10 w11 w12")
    assert(out._5 == 8L && out._6) // 20 > 4 + 8 -> truncated
  }

  test("short docs: no-completion docs drop, partial completions keep exact counts") {
    val docs = Seq(
      (1L, "a b c d", "en", "s", 0L),        // 4 tokens = promptTok: dropped
      (2L, "a b c d e f", "en", "s", 0L))    // 2 completion tokens, not truncated
      .toDF(cols: _*)
    val out = SftPairs.sftPairs(docs, promptTok = 4, completionTok = 8)
      .as[(Long, String, String, String, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(2L))
    assert(out.head._4 == "e f" && out.head._5 == 2L && !out.head._6)
  }
}
