package graft.relational

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def parts(rows: (Long, String, String)*) =
    rows.toSeq.toDF("p_partkey", "p_name", "p_brand")

  test("fuzzy join: near-matches inside a block pair up, distance exact") {
    val out = FuzzyJoin.blockedFuzzyPairs(parts(
      (1L, "red widget", "B1"), (2L, "rad widget", "B1"), // dist 1
      (3L, "green widget", "B1"), // dist 3+ from both
      (4L, "red widget", "B1")), // exact dup of 1 → dist 0
      maxDist = 2)
      .select("key_a", "key_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1), (1L, 4L, 0), (2L, 4L, 1)))
  }

  test("fuzzy join: block keys gate candidates — same name, other brand/token never pairs") {
    val out = FuzzyJoin.blockedFuzzyPairs(parts(
      (1L, "red widget", "B1"),
      (2L, "red widget", "B2"), // other brand: blocked out even at dist 0
      (3L, "red gear", "B1")), // other last token: blocked out
      maxDist = 3)
    assert(out.count() === 0)
  }

  test("fuzzy join: length guard is exact — never drops a pair within maxDist") {
    // edit distance >= |len(a) - len(b)|, so the guard can only remove
    // pairs that the distance filter would remove anyway
    val ps = parts(
      (1L, "a widget", "B1"), (2L, "abcd widget", "B1"), // len diff 3, dist 3
      (3L, "abcde widget", "B1")) // len diff 4 from 1 → guard AND dist both drop
    val out = FuzzyJoin.blockedFuzzyPairs(ps, maxDist = 3)
      .select("key_a", "key_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 3), (2L, 3L, 1)))
  }
}
