package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test for the prefix-filtered similarity join
  * (q129): on arbitrary corpora the blocked pipeline must equal the
  * O(n²) brute force — the completeness theorem (any pair with Jaccard
  * ≥ t shares a token in both df-ordered prefixes) checked empirically
  * across random token distributions, duplicate docs, heavy stopwords
  * and several thresholds.
  */
class PrefixJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small vocabulary with a few very common words → dense overlap and
  // hot prefix tokens
  private val vocab: Vector[String] =
    (Vector("the", "of") ++ (0 until 20).map(i => s"w$i"))
  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 100000L)
    n <- Gen.chooseNum(2, 9)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield (id, toks.mkString(" "))

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] =
    sample(Gen.listOfN(nDocs, docGen), seed)
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)

  private def brute(docs: Seq[(Long, String)], num: Int, den: Int): Set[(Long, Long)] = {
    def set(t: String): Set[String] = t.trim.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = set(ta); sb = set(tb) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size; un = (sa | sb).size
      if inter * den >= un * num
    } yield (ia, ib)).toSet
  }

  test("prefix join equals brute force across random corpora and thresholds") {
    for {
      seed <- 1L to 3L
      (num, den) <- Seq((1, 2), (3, 5), (4, 5))
    } {
      val docs = corpus(seed * 7919, nDocs = 35)
      val got = PrefixJoin.jaccardPairs(docs.toDF("doc_id", "text"), num, den)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == brute(docs, num, den),
        s"seed=$seed t=$num/$den: prefix join diverged from brute force")
    }
  }
}
