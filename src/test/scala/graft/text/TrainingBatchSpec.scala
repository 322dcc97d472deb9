package graft.text

import graft.SparkSpec

class TrainingBatchSpec extends SparkSpec {
  import spark.implicits._

  test("length buckets: smallest power of two >= token count, integer-exact") {
    // token counts: 1->1, 2->2, 3->4, 4->4, 5->8, blank->bucket 1
    val docs = Seq(
      (1L, "one"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e"), (6L, "   ")).toDF("doc_id", "text")
    val out = TrainingBatch.lengthBuckets(docs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // bucket 1: blank (0 tokens) + "one" (1 token): total 1, padded 2
    // bucket 2: "a b": total 2, padded 2 (no waste)
    // bucket 4: 3 + 4 tokens: total 7, padded 8
    // bucket 8: 5 tokens: total 5, padded 8
    assert(out == Seq(
      (1L, 2L, 1L, 2L, 0.5),
      (2L, 1L, 2L, 2L, 0.0),
      (4L, 2L, 7L, 8L, 1.0 / 8.0),
      (8L, 1L, 5L, 8L, 3.0 / 8.0)))
  }

  test("length buckets: exact powers of two stay in their own bucket") {
    // 2^k tokens must land in bucket 2^k, not 2^(k+1) — the case a float
    // ceil(log2(n)) gets wrong when log2 comes out one ulp above k
    val doc64 = (1 to 64).map(i => s"t$i").mkString(" ")
    val doc128 = (1 to 128).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc64), (2L, doc128)).toDF("doc_id", "text")
    val buckets = TrainingBatch.lengthBuckets(docs)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1).toSet
    assert(buckets == Set(64L, 128L))
  }
}
