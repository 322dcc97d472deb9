package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force exact Jaccard pairs — the O(n²) ground truth. */
  private def bruteForce(docs: Seq[(Long, String)], num: Int, den: Int): Set[(Long, Long)] = {
    def set(t: String): Set[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = set(ta); sb = set(tb) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size; un = (sa | sb).size
      if inter * den >= un * num
    } yield (ia, ib)).toSet
  }

  test("prefix filter is complete: matches brute force on a mixed fixture") {
    // planted near-dup cluster + unrelated docs + a shared-stopword trap
    // (every doc shares "the" — a plain token join would pair everything;
    // the df-ordered prefix puts "the" last, so it never generates
    // candidates, yet completeness must survive)
    val docs: Seq[(Long, String)] = Seq(
      1L -> "the quick brown fox jumps over lazy dog",
      2L -> "the quick brown fox jumps over lazy cat",   // ~0.8 vs 1
      3L -> "the quick brown fox jumps over lazy dog",   // exact dup of 1
      4L -> "the completely different text about spark engines",
      5L -> "the completely different text about spark clusters",
      6L -> "the a b c d e f g h i j k l m n",
      7L -> "the z y x w v u t s r q p o n m")
    val got = PrefixJoin.jaccardPairs(
      docs.toDF("doc_id", "text"), num = 3, den = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == bruteForce(docs, 3, 5))
    assert(got.contains((1L, 3L)) && got.contains((1L, 2L)))
    assert(!got.contains((6L, 7L))) // one shared rare-ish token, low Jaccard
  }

  test("prefix filter matches brute force on a deterministic random corpus") {
    // deterministic pseudo-corpus: enough token overlap to exercise both
    // accept and reject paths at t = 1/2
    val vocab = (0 until 30).map(i => s"w$i")
    val docs: Seq[(Long, String)] = (0 until 40).map { i =>
      val toks = (0 until 8).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
    val got = PrefixJoin.jaccardPairs(
      docs.toDF("doc_id", "text"), num = 1, den = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == bruteForce(docs, 1, 2))
    assert(got.nonEmpty)
  }

  test("threshold arguments are validated") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { PrefixJoin.jaccardPairs(df, 0, 5) }
    intercept[IllegalArgumentException] { PrefixJoin.jaccardPairs(df, 6, 5) }
  }
}
