package graft.text

import graft.SparkSpec

class TopicsSpec extends SparkSpec {

  test("label topics: tf within label, df across labels, idf = ln(n/df), top-k per label") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana date")).toDF("doc_id", "text")
    val emb = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("vec_id", "label")
    val out = Topics.labelTopics(docs, emb, k = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val ln2r = math.rint(math.log(2.0) * 1e6) / 1e6      // 0.693147
    val ln2x3 = math.rint(3 * math.log(2.0) * 1e6) / 1e6 // 2.079442
    assert(out.toSeq === Seq(
      // label 0: apple tf=3 df=1 → 3·ln2; cherry tf=1 df=1 → ln2;
      // banana (df=2 → idf 0) falls below both
      (0, 1, "apple", 3L, 1L, ln2x3),
      (0, 2, "cherry", 1L, 1L, ln2r),
      // label 1: date tf=1 df=1 → ln2; banana tf=2 df=2 → 0
      (1, 1, "date", 1L, 1L, ln2r),
      (1, 2, "banana", 2L, 2L, 0.0)))
  }

  test("ties break by term ascending within equal scores") {
    import spark.implicits._
    val docs = Seq((1L, "zebra alpha"), (2L, "common")).toDF("doc_id", "text")
    val emb = Seq((1L, 0), (2L, 1)).toDF("vec_id", "label")
    // label 0: zebra and alpha both tf=1, df=1 → equal score; alpha first
    val out = Topics.labelTopics(docs, emb, k = 2).collect()
      .filter(_.getInt(0) == 0).map(r => (r.getInt(1), r.getString(2)))
    assert(out.toSeq === Seq((1, "alpha"), (2, "zebra")))
  }
}
