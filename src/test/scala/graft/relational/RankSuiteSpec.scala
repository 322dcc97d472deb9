package graft.relational

import graft.SparkSpec

class RankSuiteSpec extends SparkSpec {
  import spark.implicits._

  test("rank suite: distribution-window invariants per partition") {
    val rows = ExtendedQueries.q128.run(spark, "/root/testdata/sf0.001")
      .selectExpr("o_orderpriority", "n_orders", "quartile", "pct_rank", "cume")
      .as[(String, Long, Int, Double, Double)]
      .collect().toSeq
      .map(r => (r._1, null, r._2, r._3, r._4, r._5))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prio, part) =>
      val n = part.size
      // rows arrive ordered by (n_orders, d) == window order
      val quartiles = part.map(_._4)
      val pctRanks = part.map(_._5)
      val cumes = part.map(_._6)
      assert(quartiles.forall(q => q >= 1 && q <= 4), prio)
      assert(quartiles == quartiles.sorted, s"$prio ntile not monotone")
      // ntile(4) balance: bucket sizes differ by at most 1
      val sizes = quartiles.groupBy(identity).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$prio ntile unbalanced: $sizes")
      assert(pctRanks.head == 0.0, prio)
      assert(pctRanks == pctRanks.sorted, prio)
      assert(cumes.last == 1.0, prio)
      // cume_dist = (rows with key <= current)/n — spot-check via count
      assert(cumes.forall(c => c > 0.0 && c <= 1.0), prio)
      assert(cumes.map(c => math.round(c * n)).toSet.subsetOf(
        (1 to n).map(_.toLong).toSet), prio)
    }
  }
}
