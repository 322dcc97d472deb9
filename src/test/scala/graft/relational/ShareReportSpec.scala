package graft.relational

import graft.SparkSpec

class ShareReportSpec extends SparkSpec {
  import spark.implicits._

  test("nation shares: region shares sum to 1, global shares to 1") {
    val dir = "/root/testdata/sf0.001"
    val out = ShareReport.nationShares(
      graft.Tables.lineitem(spark, dir), graft.Tables.supplier(spark, dir),
      graft.Tables.nation(spark, dir), graft.Tables.region(spark, dir))
      .as[(String, String, Double, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (region, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, region)
    }
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-9)
    // global share never exceeds its region share
    out.foreach { r => assert(r._5 <= r._4 + 1e-12, r) }
  }

  test("cheapest supplier: min unit price wins, ties break on key") {
    val li = Seq(
      // part 1: supp 5 at 2.0/unit, supp 3 at 1.0/unit -> supp 3
      (1L, 5L, 10.0, 20.0), (1L, 3L, 10.0, 10.0),
      // part 2: both 1.0/unit -> lower key 2 wins
      (2L, 7L, 4.0, 4.0), (2L, 2L, 6.0, 6.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val out = ShareReport.cheapestSupplier(li)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 1.0), (2L, 2L, 1.0)))
  }
}
