package graft.text

import graft.SparkSpec

class FilterCascadeSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  // a doc that passes every stage: long enough, quality in band, English
  private def good(id: Long, source: String, salt: String = "") = {
    val base = ("the quick brown fox jumps over lazy dog and cat " * 4) + salt
    (id, base, "en", source, 0L)
  }

  test("stages attrit cumulatively and dups keep the first doc corpus-wide") {
    val docs = Seq(
      good(1, "A"),
      (2L, "", "en", "A", 0L),             // blank: fails s1
      (3L, "tiny text", "en", "A", 0L),    // short: fails s2
      // 600 chars -> quality 0.85 passes s3; predicted 'de' fails s4
      (4L, "der die das und ist " * 30, "de", "A", 0L),
      good(5, "A"),                        // dup of doc 1? no - same text as good(1)
      good(6, "B")                         // same text in another source
    ).toDF(cols: _*)
    val out = FilterCascade.cascadeReport(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val a = out("A")
    // A: 5 docs; blank fails s1; short fails s2; german fails s4;
    // docs 1,5 identical -> one survives dedup
    assert((a._2, a._3, a._4) == ((5L, 4L, 3L)))
    assert(a._6 == 2L) // s4_lang: docs 1 and 5
    assert(a._7 == 1L) // s5_unique: doc 1 only (5 is a dup, 6 is in B later)
    // B's copy of the same text is a cross-source dup of doc 1
    assert(out("B")._7 == 0L)
    assert(out("B")._6 == 1L)
  }

  test("tok_final sums only the surviving docs' tokens") {
    val docs = Seq(good(1, "A"), good(2, "A", "extra words here")).toDF(cols: _*)
    val out = FilterCascade.cascadeReport(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // both unique -> both survive; token mass is both docs'
    val toks = docs.select(TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text")))
      .as[Int].collect().sum
    assert(out._7 == 2L && out._8 == toks.toLong)
  }
}
