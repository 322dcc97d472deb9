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

  test("jaro-winkler length-ratio prune is exact — brute force agrees on adversarial lengths") {
    // Names engineered around the bound: JW >= 0.95 forces
    // min/max length >= 0.75, and the prune must agree with an
    // unpruned brute force on pairs AT and NEAR that ratio, including
    // max-prefix-boost shapes (shared 4+ char prefixes, which maximize
    // JW for a given Jaro and so stress the bound's slack).
    val rows = Seq(
      (1L, "prefixaaaaaaaaaaa widget", "B1"), // len 24
      (2L, "prefixaaaaaaaaaab widget", "B1"), // len 24: near-identical
      (3L, "prefixa widget", "B1"),           // len 14: ratio .58 vs 24
      (4L, "prefixaaaaaaaaaaaaaaaaa widget", "B1"), // len 30: ratio .8 vs 24
      (5L, "prefixaaaaaaaaaaa gadget", "B1"),
      (6L, "zz widget", "B1"),
      (7L, "prefixaaaaaaaaaaa widget", "B2"))
    val got = FuzzyJoin.jaroWinklerPairs(parts(rows: _*), minSim = 0.95)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // brute force: same blocks, same kernel, NO prune
    def jw(a: String, b: String): Double = graft.text.JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val byBlock = rows.groupBy(r => (r._2.split(" ").last, r._3))
    val want = (for {
      (_, g) <- byBlock.toSeq
      a <- g; b <- g
      if a._1 < b._1 && a._2 != b._2 && jw(a._2, b._2) >= 0.95
    } yield (a._1, b._1)).toSet
    assert(got === want, s"pruned=$got brute=$want")
    assert(want.nonEmpty, "fixture must produce at least one surviving pair")
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
