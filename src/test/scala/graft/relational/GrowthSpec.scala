package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class GrowthSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String) =
    (id, Timestamp.valueOf(t), user, "view", 1.0, "{}")

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("cumulative users: first-seen dates only, running total") {
    val rows = Seq(
      ev(1, 1, "2020-01-01 10:00:00"),
      ev(2, 1, "2020-01-03 10:00:00"), // repeat user: not new on day 3
      ev(3, 2, "2020-01-01 11:00:00"),
      ev(4, 3, "2020-01-03 09:00:00"))
    val out = Growth.cumulativeUsers(rows.toDF(cols: _*))
      .selectExpr("CAST(d AS DATE)", "new_users", "cumulative_users")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1.toString, r._2, r._3)) == Seq(
      ("2020-01-01", 2L, 2L), ("2020-01-03", 1L, 3L)))
  }

  test("growth accounting: new, retained, resurrected, churned") {
    // user 1: Jan, Feb, Apr  -> new(Jan), retained(Feb), resurrected(Apr)
    // user 2: Jan only       -> new(Jan), churns in Feb
    val rows = Seq(
      ev(1, 1, "2020-01-05 10:00:00"),
      ev(2, 1, "2020-02-10 10:00:00"),
      ev(3, 1, "2020-04-01 10:00:00"),
      ev(4, 2, "2020-01-20 10:00:00"))
    val out = Growth.growthAccounting(rows.toDF(cols: _*))
      .selectExpr("CAST(m AS DATE)", "new_users", "retained", "resurrected", "churned")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
      .map(r => r._1.toString -> (r._2, r._3, r._4, r._5)).toMap
    assert(out("2020-01-01") == ((2L, 0L, 0L, 0L)))
    // Feb: user1 retained; user2 churned (active Jan, not Feb)
    assert(out("2020-02-01") == ((0L, 1L, 0L, 1L)))
    // Apr: user1 resurrected (gap over March)
    assert(out("2020-04-01") == ((0L, 0L, 1L, 0L)))
    // March emits no row (nobody active) — churn of Feb's actives is
    // only visible on active months by construction
    assert(!out.contains("2020-03-01"))
  }

  test("period over period: calendar joins, not lag — empty months can't misalign") {
    def ord(key: Long, date: String, total: Double) =
      (key, 1L, "O", total, Timestamp.valueOf(date + " 00:00:00"), "1-URGENT")
    val ordCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    // Jan-2020 100, Mar-2020 150 (Feb empty), Mar-2021 300
    val rows = Seq(ord(1, "2020-01-15", 100.0), ord(2, "2020-03-10", 150.0),
      ord(3, "2021-03-20", 300.0))
    val out = Growth.periodOverPeriod(rows.toDF(ordCols: _*))
      .selectExpr("CAST(m AS DATE)", "revenue", "mom_pct", "yoy_pct")
      .as[(java.sql.Date, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap
    assert(out("2020-01-01") == ((100.0, None, None)))
    // March's MoM must be null (Feb empty), NOT computed against January
    assert(out("2020-03-01") == ((150.0, None, None)))
    assert(out("2021-03-01") == ((300.0, None, Some(100.0))))
  }
}
