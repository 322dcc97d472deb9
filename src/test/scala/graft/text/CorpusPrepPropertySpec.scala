package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property tests for the hierarchical prefix-sum/rank
  * operators: on arbitrary corpora the distributed decompositions must
  * equal an independent plain-Scala flat computation — the same contract
  * the DuckDB oracles pin on the fixture corpus, here exercised on
  * shapes the fixtures never contain (empty docs, huge/sparse doc_ids,
  * single-token docs, duplicate-heavy vocabularies).
  */
class CorpusPrepPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 5000000000L)
    n <- Gen.chooseNum(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
  } yield (id, toks.mkString(" "))

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] =
    sample(Gen.listOfN(nDocs, docGen), seed)
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1) // unique ids

  private def toks(text: String): Seq[String] = text.trim.split("\\s+").toSeq

  test("packing equals the flat driver reference on random corpora") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed, 60)
      val (window, stride, budget) = (5, 3, 17)
      // flat reference: chunk sequentially, global cumsum, batch = off/budget
      val refChunks = docs.flatMap { case (id, text) =>
        val t = toks(text)
        val nChunks = if (t.size <= window) 1
          else (t.size - window + stride - 1) / stride + 1
        (0 until nChunks).map { i =>
          (id, i, math.min(window, t.size - i * stride))
        }
      }.sortBy(c => (c._1, c._2))
      val offsets = refChunks.scanLeft(0L)((acc, c) => acc + c._3).init
      val ref = refChunks.zip(offsets).map { case ((id, cid, n), off) =>
        (id, cid, n, off, off / budget)
      }
      val got = CorpusPrep.packChunks(
        CorpusPrep.chunkDocuments(docs.toDF("doc_id", "text"), window, stride),
        budget, groupSize = 7)
        .as[(Long, Int, Int, Long, Long)].collect().toSeq
      assert(got == ref, s"seed=$seed")
    }
  }

  test("shuffle order equals the flat driver reference on random corpora") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed + 10, 80)
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long): String =
        md.digest(s"9:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ref = docs.map(_._1).sortBy(id => (h(id), id)).zipWithIndex
        .map { case (id, pos) => (id, pos.toLong) }.sortBy(_._1)
      val got = CorpusPrep.shuffleOrder(docs.toDF("doc_id", "text"), seed = 9L,
          buckets = 13)
        .as[(Long, Long)].collect().toSeq
      assert(got == ref, s"seed=$seed")
    }
  }

  test("training windows equal the flat driver reference on random corpora") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed + 30, 40)
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(id: Long): String =
        md.digest(s"3:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val stream = docs.map(_._1).sortBy(id => (h(id), id))
        .flatMap(id => toks(docs.toMap.apply(id)))
      val ref = stream.grouped(7).zipWithIndex
        .map { case (w, i) => (i.toLong, w.size.toLong, w.mkString(" ")) }.toSeq
      val got = CorpusPrep.trainingWindows(docs.toDF("doc_id", "text"),
          seed = 3L, windowTokens = 7, groupSize = 5)
        .as[(Long, Long, String)].collect().toSeq
      assert(got == ref, s"seed=$seed")
    }
  }

  test("repetition signals equal the flat driver reference") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed + 20, 50).filter(_._2.nonEmpty)
      val ref = docs.map { case (id, text) =>
        val t = toks(text)
        def grams(n: Int): Seq[String] =
          if (t.size < n) Nil else t.sliding(n).map(_.mkString(" ")).toSeq
        def dupFrac(xs: Seq[String]): Double =
          if (xs.isEmpty) 0.0 else 1.0 - xs.distinct.size.toDouble / xs.size
        val bi = grams(2)
        val top = if (bi.isEmpty) 0.0
          else bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size
        (id, t.size, dupFrac(t), dupFrac(bi), dupFrac(grams(3)), top)
      }.sortBy(_._1)
      val got = Repetition.repetitionSignals(docs.toDF("doc_id", "text"))
        .as[(Long, Int, Double, Double, Double, Double)].collect().toSeq
      assert(got == ref, s"seed=$seed")
    }
  }
}
