package graft.text

import graft.SparkSpec

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("every shard appears exactly once, loads reconcile, empties are zero") {
    val docs = (1L to 40L).map(i => (i, "x" * i.toInt, "en", "s", 0L))
      .toDF(cols: _*)
    val out = Sharding.shardBalance(docs, nShards = 16)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == (0L until 16L)) // full spine, ordered
    assert(out.map(_._2).sum == 40L)
    assert(out.map(_._3).sum == (1 to 40).sum.toLong)
    // ratios average to 1 over the spine (empty shards contribute 0)
    val meanRatio = out.map(_._4).sum / 16
    assert(math.abs(meanRatio - 1.0) < 1e-6)
    out.filter(_._2 == 0).foreach(r => assert(r._3 == 0L && r._4 == 0.0))
  }

  test("assignment is deterministic and key-driven, not row-order-driven") {
    val a = (1L to 20L).map(i => (i, "t", "en", "s", 0L)).toDF(cols: _*)
    val b = (1L to 20L).reverse.map(i => (i, "t", "en", "s", 0L)).toDF(cols: _*)
    val ra = Sharding.shardBalance(a, 8).as[(Long, Long, Long, Double)].collect().toSeq
    val rb = Sharding.shardBalance(b, 8).as[(Long, Long, Long, Double)].collect().toSeq
    assert(ra == rb)
  }
}
