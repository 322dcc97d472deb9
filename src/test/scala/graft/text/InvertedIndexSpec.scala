package graft.text

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("inverted index: containers split by doc-id range, postings ascending") {
    // bits=2 -> container width 4: docs 0-3 land in container 0, 4-7 in 1
    val docs = Seq(
      (0L, "apple banana"),
      (3L, "apple apple cherry"), // in-doc repeat dedups to one posting
      (4L, "apple"),
      (7L, "banana")
    ).toDF("doc_id", "text")
    val out = InvertedIndex.invertedIndex(docs, bits = 2)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("apple", 0L, 2L, "0,3"),
      ("apple", 1L, 1L, "4"),
      ("banana", 0L, 1L, "0"),
      ("banana", 1L, 1L, "7"),
      ("cherry", 0L, 1L, "3")))
    intercept[IllegalArgumentException] { InvertedIndex.invertedIndex(docs, bits = 0) }
  }

  test("inverted index: per-container state stays bounded by the width") {
    val docs = (0L until 40L).map(i => (i, "hot")).toDF("doc_id", "text")
    val out = InvertedIndex.invertedIndex(docs, bits = 3)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out.size == 5) // 40 docs / 2^3 per container
    assert(out.forall(_._3 == 8L))
    assert(out.map(_._2) == (0L until 5L))
    // reassembling the containers in order yields the full ascending list
    val all = out.sortBy(_._2).flatMap(_._4.split(",").map(_.toLong))
    assert(all == (0L until 40L))
  }
}
