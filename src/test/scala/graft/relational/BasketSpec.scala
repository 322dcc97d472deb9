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
}
