package graft.relational

import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("full-outer recon: matched, dimension-only, orphaned facts") {
    val customer = Seq(
      (1L, "AUTO"), (2L, "AUTO"), (3L, "HOME"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L), (11L, 1L), (12L, 3L), (13L, 99L)) // 99 is an orphan
      .toDF("o_orderkey", "o_custkey")
    val out = Reconcile.customerOrderRecon(customer, orders)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("AUTO", 1L, 1L, 0L, 2L),      // cust 1 matched (2 orders), cust 2 unmatched
      ("HOME", 1L, 0L, 0L, 1L),
      ("ORPHANED", 0L, 0L, 1L, 1L))) // custkey 99's orders have no customer
  }
}
