package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized losslessness property for the angular-prune candidate
  * filter ([[VectorExprs.CandidateCells]]) — the mathematical claim the
  * pruned SemDedup assignment rests on: for EVERY query vector, the
  * candidate cell set contains the cell of the globally-best seed (and
  * of every exact tie), whatever the geometry, including the adversarial
  * shapes the triangle-inequality proof has to survive — zero-norm
  * vectors/seeds/centers, duplicate vectors, near-ties, clustered and
  * uniform corpora. 60 randomized rounds with a fixed seed
  * (deterministic; no Math.random in specs).
  */
class CandidateCellsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("candidate set always contains the argmax seed's cell (60 random geometries)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 60).foreach { round =>
      val dims = 2 + rnd.nextInt(6)
      val nSeeds = 3 + rnd.nextInt(20)
      val m = 1 + rnd.nextInt(math.max(1, nSeeds / 2))
      val clustered = rnd.nextBoolean()
      def vec(): Array[Float] = {
        val base = Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)
        val v =
          if (rnd.nextInt(20) == 0) Array.fill(dims)(0.0f) // zero-norm
          else if (clustered) {
            val axis = rnd.nextInt(dims)
            val out = base.map(_ * 0.1f); out(axis) = (out(axis) + 1.0f); out
          } else base
        v
      }
      val seeds = Array.fill(nSeeds)(vec())
      // duplicate seeds sometimes (exact-tie shape)
      if (nSeeds > 2 && rnd.nextBoolean()) seeds(1) = seeds(0).clone()
      val centers = Array.tabulate(m)(i => seeds(i % nSeeds).clone())

      // seed -> nearest-center assignment + radii, the caller's contract
      def nearestCenter(s: Array[Float]): (Int, Double) = {
        var best = 0; var bestSim = Double.NegativeInfinity
        centers.indices.foreach { c =>
          val sim = cos(s, centers(c))
          if (sim > bestSim) { bestSim = sim; best = c }
        }
        (best, math.acos(math.max(-1.0, math.min(1.0, bestSim))))
      }
      val radii = Array.fill(m)(-1.0)
      val seedCell = seeds.map { s =>
        val (c, theta) = nearestCenter(s)
        radii(c) = math.max(radii(c), theta + 1e-6)
        c
      }
      centers.indices.foreach { j =>
        if (radii(j) >= 0 && centers(j).forall(_ == 0.0f)) radii(j) = math.Pi
      }

      val queries = Array.fill(12)(vec())
      val cands = queries.zipWithIndex.toSeq
        .map { case (q, i) => (i, q) }.toDF("i", "q")
        .select(col("i"), VectorExprs.candidateCells(col("q"), centers, radii).as("cells"))
        .as[(Int, Seq[Int])].collect().toMap

      queries.zipWithIndex.foreach { case (q, i) =>
        // the brute-force winners: max cosine, ALL exact ties included
        val sims = seeds.map(s => cos(q, s))
        val best = sims.max
        val winnerCells = seeds.indices.filter(sims(_) == best).map(seedCell).toSet
        val got = cands(i).toSet
        winnerCells.foreach { wc =>
          assert(got.contains(wc),
            s"round $round: argmax cell $wc pruned (got $got, dims=$dims m=$m clustered=$clustered)")
        }
        // and only nonempty cells are ever emitted
        assert(got.forall(radii(_) >= 0.0), s"round $round: memberless cell emitted")
      }
    }
  }
}
