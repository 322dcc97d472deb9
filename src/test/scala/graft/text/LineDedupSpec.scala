package graft.text

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("line dedup: keep-first across docs, short lines exempt, order kept") {
    // "this boilerplate line here" appears in docs 1, 2 and 3 (twice in 3);
    // only its (1, idx=1) occurrence survives. "hi" is short -> exempt even
    // though duplicated.
    val docs = Seq(
      (1L, "alpha unique one\nthis boilerplate line here\nhi"),
      (2L, "this boilerplate line here\nbeta unique two\nhi"),
      (3L, "this boilerplate line here\ngamma\nthis boilerplate line here")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "\n", minChars = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha unique one\nthis boilerplate line here\nhi", 0L),
      (2L, "beta unique two\nhi", 1L),
      (3L, "gamma", 2L)))
  }

  test("line dedup: within-doc duplicates also collapse to the first") {
    val docs = Seq((7L, "repeated body line\nmiddle text line\nrepeated body line"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "\n", minChars = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((7L, "repeated body line\nmiddle text line", 1L)))
  }

  test("line dedup: doc reduced to empty when every line is a non-first dup") {
    val docs = Seq(
      (1L, "only boilerplate here"),
      (2L, "only boilerplate here")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "\n", minChars = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "only boilerplate here", 0L), (2L, "", 1L)))
  }

  test("line dedup: delimiter with regex metacharacters is treated literally") {
    val docs = Seq(
      (1L, "aaa|.|bbb long enough"),
      (2L, "bbb long enough|.|ccc")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "|.|", minChars = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "aaa|.|bbb long enough", 0L),
      (2L, "ccc", 1L)))
    intercept[IllegalArgumentException] { LineDedup.dedupLines(docs, "", 1) }
  }
}
