package graft.text

import graft.SparkSpec

class CorpusCardSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("card counts volume, dups, english share, and median length") {
    val good = "the quick brown fox jumps over the lazy dog and cat " * 4
    val docs = Seq(
      (1L, good, "en", "A", 0L),
      (2L, good, "en", "A", 0L),              // exact dup of doc 1
      (3L, "uno dos tres", "es", "A", 0L),
      (4L, good + "tail", "en", "B", 0L))
      .toDF(cols: _*)
    val out = CorpusCard.corpusCard(docs)
      .as[(String, Long, Long, Long, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    val a = out("A")
    assert(a._2 == 3L)                      // n_docs
    assert(math.abs(a._5 - 1.0 / 3) < 1e-6) // dup_rate: doc 2 only
    assert(math.abs(a._7 - 2.0 / 3) < 1e-6) // english: docs 1, 2
    assert(a._8 == 44L)                     // median tok of {3, 44, 44}
    assert(out("B")._5 == 0.0) // B's copy is unique (different text)
  }

  test("card columns agree with the per-operator reports on the real table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val card = CorpusCard.corpusCard(docs)
    import org.apache.spark.sql.functions._
    val nDocs = card.agg(sum("n_docs")).as[Long].collect().head
    assert(nDocs == docs.count())
    // dup accounting matches q20's content groupBy
    val nDups = card.selectExpr("CAST(round(dup_rate * n_docs) AS BIGINT)")
      .as[Long].collect().sum
    val q20Dups = docs.groupBy(md5(col("text"))).count()
      .agg(sum(col("count") - 1)).as[Long].collect().head
    assert(nDups == q20Dups)
  }
}
