package graft.vector

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
  private def query(v: Seq[Float]) = Seq(Tuple1(v)).toDF("qv")

  test("mmr: diversifies — the near-twin of the top pick loses to a fresh direction") {
    // rel(1) = rel(2) ≈ 0.990 (mirror pair around the query), rel(3) ≈ 0.272.
    // Pure relevance: 1, 2, 3. MMR(λ=0.5): after 1, candidate 2's margin is
    // 0.5·(0.990 − sim(2,1)=0.961) ≈ 0.015 while 3's is
    // 0.5·(0.272 − sim(3,1)=0.135) ≈ 0.069 — the fresh direction wins round 2.
    val out = Mmr.mmrRerank(corpus(
      (1L, Seq(1f, 1f, 0.2f)),
      (2L, Seq(1f, 1f, -0.2f)),
      (3L, Seq(1f, 1f, -5f))),
      query(Seq(1f, 1f, 0f)), k = 3, poolSize = 3)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(out === Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("mmr: first pick is pure relevance; exact score ties break on min vec_id") {
    // 4 and 7 are identical (rel 1.0) → round 1 is a tie, id 4 wins. In
    // round 2 every remaining candidate c has sim(c, pick) = rel(c) (the
    // pick IS the query direction), so all margins are (2λ−1)·rel = 0 at
    // λ=0.5 — again a tie, and the min id (7) wins over 9.
    val out = Mmr.mmrRerank(corpus(
      (7L, Seq(1f, 0f)), (4L, Seq(1f, 0f)), (9L, Seq(0f, 1f))),
      query(Seq(1f, 0f)), k = 2, poolSize = 3)
      .select("rank", "vec_id", "rel").as[(Int, Long, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2)) === Seq((1, 4L), (2, 7L)))
    assert(out.head._3 === 1.0)
  }

  test("mmr: k = poolSize exhausts the pool in score order") {
    val out = Mmr.mmrRerank(corpus(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))),
      query(Seq(1f, 0f)), k = 2, poolSize = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }

  test("mmr: a pool smaller than k yields pool-many picks, not a crash") {
    // k exceeds the corpus: the argmax loop must stop when every row is
    // picked (was an ArrayIndexOutOfBounds on picked(-1))
    val out = Mmr.mmrRerank(corpus(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))),
      query(Seq(1f, 0f)), k = 10, poolSize = 50)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(out === Seq((1, 1L), (2, 2L)))
  }

  test("mmr: empty corpus yields an empty result") {
    val out = Mmr.mmrRerank(corpus(), query(Seq(1f, 0f)), k = 5, poolSize = 10)
    assert(out.count() === 0)
  }
}
