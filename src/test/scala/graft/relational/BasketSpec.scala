package graft.relational

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("copurchase pairs: per-order dedup, unordered pairs, min support") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup part in one order counts once
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 99L)                        // singleton basket: no pairs
    ).toDF("l_orderkey", "l_partkey")
    val out = Basket.copurchasePairs(li, minSupport = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 20L, 2L))) // (10,30) support 1 filtered
    intercept[IllegalArgumentException] { Basket.copurchasePairs(li, 0) }
  }

  test("also-bought: symmetric neighbors ranked by support, ties on id") {
    // baskets make supports: (10,20)=3, (10,30)=2, (20,30)=2
    val li = (1L to 3L).flatMap(o => Seq((o, 10L), (o, 20L))) ++
      Seq((4L, 10L), (4L, 30L), (5L, 10L), (5L, 30L),
        (6L, 20L), (6L, 30L), (7L, 20L), (7L, 30L))
    val out = Basket.alsoBought(li.toDF("l_orderkey", "l_partkey"),
      minSupport = 2, k = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // item 10: rec 20 (support 3) then 30 (2); item 30: tie support 2 ->
    // lower id 10 first
    assert(out == Seq(
      (10L, 20L, 3L, 1), (10L, 30L, 2L, 2),
      (20L, 10L, 3L, 1), (20L, 30L, 2L, 2),
      (30L, 10L, 2L, 1), (30L, 20L, 2L, 2)))
    intercept[IllegalArgumentException] {
      Basket.alsoBought(li.toDF("l_orderkey", "l_partkey"), 2, 0)
    }
  }

  test("pair lift: hand-computed attraction and repulsion") {
    // 4 baskets; parts 10, 20 always together (lift = 4*4/(4*4) = 1? no:
    // both in all 4 baskets, support 4 -> lift = 4*4/(4*4) = 1.0)
    // part 30 in 2 baskets always with 10 -> lift(10,30) = 2*4/(4*2) = 1.0
    // make attraction: 40,50 only in basket 4 together, each n=1:
    // lift = 1*4/(1*1) = 4.0
    val li = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 20L), (4L, 30L), (4L, 40L), (4L, 50L))
      .toDF("l_orderkey", "l_partkey")
    val out = Basket.pairLift(li, minSupport = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((10L, 20L)) == ((4L, 1.0)))
    assert(out((10L, 30L)) == ((2L, 1.0)))
    assert(out((40L, 50L)) == ((1L, 4.0)))
  }

  test("association rules: directed confidence and the conviction null edge") {
    // same fixture: 30 -> 10 has confidence 2/2 = 1 (exact rule, null
    // conviction); 10 -> 30 has confidence 2/4, P(30) = 1/2 ->
    // conviction = (1 - 0.5)/(1 - 0.5) = 1.0
    val li = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 20L), (4L, 30L), (4L, 40L), (4L, 50L))
      .toDF("l_orderkey", "l_partkey")
    val out = Basket.assocRules(li, minSupport = 1)
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    assert(out((30L, 10L)) == ((1.0, 1.0, None)))
    assert(out((10L, 30L)) == ((0.5, 1.0, Some(1.0))))
    // attraction both ways for the exclusive pair
    assert(out((40L, 50L))._2 == 4.0 && out((50L, 40L))._2 == 4.0)
    // every pair emits both directions
    assert(out.keySet.map { case (a, b) => (b, a) } == out.keySet)
  }
}
