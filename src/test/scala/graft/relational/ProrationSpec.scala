package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class ProrationSpec extends SparkSpec {
  import spark.implicits._

  private def ord(key: Long, total: Double) =
    (key, 1L, "O", total, Timestamp.valueOf("2020-01-01 00:00:00"), "1-URGENT")

  private def li(key: Long, line: Int, ext: Double) =
    (key, 1L, 1L, line, 1.0, ext, 0.0, 0.0, "N", "O",
      Timestamp.valueOf("2020-01-02 00:00:00"))

  private val ordCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")
  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  test("largest remainder: 100 cents over three equal lines -> 34/33/33") {
    // equal ext -> equal remainders -> line-number tiebreak gives the
    // leftover cent to the FIRST line
    val out = Proration.prorate(
      Seq(ord(1, 1.00)).toDF(ordCols: _*),
      Seq(li(1, 1, 5.0), li(1, 2, 5.0), li(1, 3, 5.0)).toDF(liCols: _*))
      .select("l_linenumber", "alloc_cents").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 34L), (2, 33L), (3, 33L)))
  }

  test("unequal shares round toward the larger remainder, not the larger line") {
    // target 101 cents over ext 2.00/1.00: exact shares 67.333/33.667
    // -> bases 67/33, leftover 1 cent goes to line 2 (remainder 2/3 > 1/3)
    val out = Proration.prorate(
      Seq(ord(7, 1.01)).toDF(ordCols: _*),
      Seq(li(7, 1, 2.0), li(7, 2, 1.0)).toDF(liCols: _*))
      .select("l_linenumber", "alloc_cents").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 67L), (2, 34L)))
  }

  test("reconciliation invariant holds on the real table at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val alloc = Proration.prorate(
      graft.Tables.orders(spark, dir), graft.Tables.lineitem(spark, dir))
    val bad = alloc.groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.sum("alloc_cents").as("s"))
      .join(
        graft.Tables.orders(spark, dir).selectExpr(
          "o_orderkey AS l_orderkey",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS t"),
        Seq("l_orderkey"))
      .filter("s <> t")
    assert(bad.count() == 0, "per-order allocations must sum to the header total exactly")
  }
}
