package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test for line-level dedup (q73): on arbitrary
  * corpora the distributed pipeline must equal a plain-Scala flat
  * reference — tiny line vocabulary so cross-doc duplicate lines are
  * dense, plus empty lines, single-line docs and all-dup docs.
  */
class LineDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // 6 possible lines (2 below the minChars=8 bar) → heavy duplication
  private val lineGen: Gen[String] = Gen.oneOf(
    "alpha beta gamma", "delta epsilon", "zeta eta theta iota",
    "kappa lambda", "hi", "")
  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 100000L)
    n <- Gen.chooseNum(1, 6)
    lines <- Gen.listOfN(n, lineGen)
  } yield (id, lines.mkString("\n"))

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] =
    sample(Gen.listOfN(nDocs, docGen), seed)
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)

  /** Flat reference: global first-occurrence per long-enough line, then
    * per-doc filter + rejoin.
    */
  private def ref(docs: Seq[(Long, String)], minChars: Int): Seq[(Long, String, Long)] = {
    val occ = docs.flatMap { case (id, text) =>
      text.split("\n", -1).zipWithIndex.map { case (l, i) => (l, id, i) }
    }.filter(_._1.length >= minChars)
    val first = occ.groupBy(_._1).map { case (l, os) =>
      l -> os.map(o => (o._2, o._3)).min
    }
    docs.map { case (id, text) =>
      val lines = text.split("\n", -1).zipWithIndex
      val kept = lines.collect {
        case (l, i) if l.length < minChars || first(l) == (id, i) => l
      }
      (id, kept.mkString("\n"), (lines.length - kept.length).toLong)
    }.sortBy(_._1)
  }

  test("line dedup equals the flat reference on random corpora") {
    (1L to 8L).foreach { seed =>
      val docs = corpus(seed, nDocs = 30)
      val got = LineDedup.dedupLines(docs.toDF("doc_id", "text"), "\n", minChars = 8)
        .as[(Long, String, Long)].collect().toSeq
      assert(got == ref(docs, 8), s"seed=$seed")
    }
  }

  test("a second pass is a no-op (dedup is idempotent on its own output)") {
    val docs = corpus(99L, nDocs = 30)
    val once = LineDedup.dedupLines(docs.toDF("doc_id", "text"), "\n", minChars = 8)
      .as[(Long, String, Long)].collect().toSeq
    val twice = LineDedup.dedupLines(
        once.map(r => (r._1, r._2)).toDF("doc_id", "text"), "\n", minChars = 8)
      .as[(Long, String, Long)].collect().toSeq
    assert(twice.forall(_._3 == 0L))
    assert(twice.map(r => (r._1, r._2)) == once.map(r => (r._1, r._2)))
  }
}
