package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def ord(key: Long, date: String, total: Double) =
    (key, 1L, "O", total, Timestamp.valueOf(date + " 00:00:00"), "1-URGENT")

  private val ordCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  test("decomposition: trend is the exact 7-day centered mean, edges null") {
    // 9 consecutive days with revenue = 7,14,21,... (multiples of 7 keep
    // the trend integral); only days 4..6 have a full window
    val rows = (1 to 9).map(i => ord(i.toLong, f"2020-01-0$i", i * 7.0))
    val out = Seasonal.weekdayDecomposition(rows.toDF(ordCols: _*))
      .selectExpr("CAST(d AS DATE) AS d", "revenue", "trend")
      .as[(java.sql.Date, Double, Option[Double])].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    assert(out("2020-01-03") == ((21.0, None)))
    // days 1..7 mean = 4*7 = 28; days 2..8 mean = 35; days 3..9 mean = 42
    assert(out("2020-01-04") == ((28.0, Some(28.0))))
    assert(out("2020-01-05") == ((35.0, Some(35.0))))
    assert(out("2020-01-06") == ((42.0, Some(42.0))))
    assert(out("2020-01-07") == ((49.0, None)))
  }

  test("decomposition: silent days appear on the spine and null the window") {
    val rows = Seq(ord(1, "2020-01-01", 10.0), ord(2, "2020-01-03", 30.0))
    val out = Seasonal.weekdayDecomposition(rows.toDF(ordCols: _*))
      .selectExpr("CAST(d AS DATE) AS d", "revenue").collect()
      .map(r => r.getDate(0).toString -> Option(r.get(1))).toMap
    assert(out.keySet == Set("2020-01-01", "2020-01-02", "2020-01-03"))
    assert(out("2020-01-02").isEmpty)
  }

  test("dow is ISO (1=Monday..7=Sunday)") {
    // 2020-01-06 is a Monday
    val rows = Seq(ord(1, "2020-01-06", 10.0))
    val out = Seasonal.weekdayDecomposition(rows.toDF(ordCols: _*))
      .select("dow").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("ewma: kernel renormalizes over present terms and decays at 0.8") {
    // two days, revenue 100 then 200:
    //   day1: only k=0 term -> ewma = 100
    //   day2: (1*200 + 0.8*100) / 1.8 = 280/1.8 = 155.5556
    val rows = Seq(ord(1, "2020-01-01", 100.0), ord(2, "2020-01-02", 200.0))
    val out = Seasonal.ewmaDaily(rows.toDF(ordCols: _*))
      .selectExpr("CAST(d AS DATE) AS d", "ewma", "n_terms")
      .as[(java.sql.Date, Double, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(out("2020-01-01") == ((100.0, 1L)))
    assert(out("2020-01-02") == ((155.5556, 2L)))
  }

  test("ewma: kernel truncates at 20 days — day 21 carries no weight from day 1") {
    val rows = Seq(ord(1, "2020-01-01", 1000000.0), ord(2, "2020-01-21", 50.0))
    val out = Seasonal.ewmaDaily(rows.toDF(ordCols: _*))
      .selectExpr("CAST(d AS DATE) AS d", "ewma", "n_terms")
      .as[(java.sql.Date, Double, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    // day 21 is k=20 from day 1: outside the kernel -> untouched by the spike
    assert(out("2020-01-21") == ((50.0, 1L)))
  }

  test("ewma weights are the exact 12dp 0.8^k ladder") {
    val w = Seasonal.ewmaWeights.toMap
    assert(w(0) == new java.math.BigDecimal("1.000000000000"))
    assert(w(1) == new java.math.BigDecimal("0.800000000000"))
    assert(w(5) == new java.math.BigDecimal("0.327680000000"))
    assert(Seasonal.ewmaWeights.size == Seasonal.EwmaWindow)
  }
}
