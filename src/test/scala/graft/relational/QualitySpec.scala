package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("quality report: planted violations are counted") {
    val li = Seq(
      (Some(1L), 1, 5.0, 0.1),
      (Some(1L), 2, 3.0, 1.5),   // bad discount
      (None, 1, 2.0, 0.0),       // null orderkey (also an orphan)
      (Some(99L), 1, 7.0, 0.2)   // orphan orderkey
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val orders = Seq(1L).toDF("o_orderkey")
    val m = Quality.lineitemQualityReport(li, orders)
      .as[(String, Double)].collect().toMap
    assert(m("row_count") == 4.0)
    assert(m("null_orderkey") == 1.0)
    assert(m("bad_discount") == 1.0)
    assert(m("min_quantity") == 2.0 && m("max_quantity") == 7.0)
    assert(m("orphan_rows") == 2.0) // the null key and key 99
  }

  test("incremental agg merge equals the full recompute, including key churn") {
    val base = Seq((1L, 10.0), (2L, 5.0)).toDF("user_id", "value")
    val delta = Seq((2L, 7.0), (3L, 2.0)).toDF("user_id", "value") // 3 is NEW
    def st(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("n"))
    val merged = Quality.mergeAggStates(st(base), st(delta))
      .select(col("user_id"), col("total").cast("double"), col("n"))
      .as[(Long, Double, Long)].collect().toSet
    assert(merged == Set((1L, 10.0, 1L), (2L, 12.0, 2L), (3L, 2.0, 1L)))
  }

  test("order consistency: matched, mismatched, and line-less orders") {
    val orders = Seq(
      (1L, "O", 110.0),   // lines recompute to 110.00 -> matched
      (2L, "O", 999.0),   // lines recompute to 50.00 -> mismatched
      (3L, "F", 42.0))    // no lines
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq(
      (1L, 100.0, 0.0, 0.10),  // 100 * 1.0 * 1.1 = 110.00
      (2L, 50.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = Quality.orderConsistencyAudit(orders, lineitem)
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("O") == (("O", 2L, 0L, 1L, 1L, Some(949.0))))
    assert(out("F") == (("F", 1L, 1L, 0L, 0L, None)))
  }
}
