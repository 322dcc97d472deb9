package graft.text

import graft.SparkSpec

class CorpusBudgetSpec extends SparkSpec {
  import spark.implicits._

  // quality for these fixtures: short text -> lenScore n_chars/500*0.4;
  // crafting exact values is brittle, so fixtures differentiate via
  // LENGTH (longer -> higher quality) and assert selection ORDER
  private def doc(id: Long, source: String, words: Int) =
    (id, Seq.fill(words)("the").mkString(" "), "en", source, 0L)

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("budget keeps the highest-quality buckets whose cumulative mass fits") {
    // source A: one 50-token doc (higher quality: longer) + one 30-token
    // doc (lower). budget 60: the 50-token bucket fits (cum 50), adding
    // the 30-token bucket would reach 80 > 60 -> cut after bucket 1
    val docs = Seq(doc(1, "A", 50), doc(2, "A", 30)).toDF(cols: _*)
    val out = CorpusBudget.budgetSelection(docs, budgetTokens = 60)
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out.size == 1)
    val (src, budget, nKept, tokKept, cutoff) = out.head
    assert((src, budget, nKept, tokKept) == (("A", 60L, 1L, 50L)))
    assert(cutoff.isDefined)
  }

  test("a source whose best bucket alone exceeds the budget keeps nothing") {
    val docs = Seq(doc(1, "A", 100), doc(2, "B", 10)).toDF(cols: _*)
    val out = CorpusBudget.budgetSelection(docs, budgetTokens = 20)
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5.isDefined))).toMap
    assert(out("A") == ((0L, 0L, false))) // 100 > 20: nothing fits
    assert(out("B") == ((1L, 10L, true)))
  }

  test("selectWithinBudget returns exactly the docs of kept buckets") {
    val docs = Seq(doc(1, "A", 50), doc(2, "A", 30), doc(3, "B", 10))
      .toDF(cols: _*)
    val kept = CorpusBudget.selectWithinBudget(docs, budgetTokens = 60)
      .as[(String, Long)].collect().toSet
    assert(kept == Set(("A", 1L), ("B", 3L)))
  }

  test("summary and doc-level selection reconcile on the real table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val summary = CorpusBudget.budgetSelection(docs, budgetTokens = 20000)
      .selectExpr("sum(n_kept)").as[Long].collect().head
    val kept = CorpusBudget.selectWithinBudget(docs, budgetTokens = 20000).count()
    assert(summary == kept)
  }
}
