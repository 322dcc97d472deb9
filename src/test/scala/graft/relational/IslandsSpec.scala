package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class IslandsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String) =
    (id, Timestamp.valueOf(t), user, "view", 1.0, "{}")

  private val evCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("streaks: runs split on gaps, same-day repeats collapse") {
    // user 1: 1,2,3 then 5,6  -> longest 3, 2 streaks, 5 active days
    // user 2: 1 (twice), 3    -> longest 1, 2 streaks, 2 active days
    val rows = Seq(
      ev(1, 1, "2020-01-01 10:00:00"), ev(2, 1, "2020-01-02 09:00:00"),
      ev(3, 1, "2020-01-03 23:00:00"), ev(4, 1, "2020-01-05 01:00:00"),
      ev(5, 1, "2020-01-06 12:00:00"),
      ev(6, 2, "2020-01-01 08:00:00"), ev(7, 2, "2020-01-01 18:00:00"),
      ev(8, 2, "2020-01-03 10:00:00"))
    val out = Islands.dayStreaks(rows.toDF(evCols: _*))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 5L), (2L, 1L, 2L, 2L)))
  }

  private def ord(key: Long, cust: Long, date: String) =
    (key, cust, "O", 100.0, Timestamp.valueOf(date + " 00:00:00"), "1-URGENT")

  private val ordCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  test("interval merge: overlap and touch merge, strict gap opens an island") {
    // key-derived duration = key % 30 + 1 days
    // cust 1: [Jan01, Jan03) via key 1 (2d), [Jan02, Jan05) via key 2 (3d)
    //         -> overlap, one island [Jan01, Jan05)
    //         [Jan05, Jan06) via key 30 (%30=0 -> 1d) touches max end Jan05
    //         -> merges (touching is covered-contiguous)
    //         [Jan10, Jan12) via key 31 (2d) -> strict gap, new island
    val rows = Seq(
      ord(1, 1, "2020-01-01"), ord(2, 1, "2020-01-02"),
      ord(30, 1, "2020-01-05"), ord(31, 1, "2020-01-10"))
    val out = Islands.mergeOrderIntervals(rows.toDF(ordCols: _*))
      .selectExpr("custkey", "island", "CAST(island_start AS DATE)",
        "CAST(island_end AS DATE)", "n_orders", "covered_days")
      .as[(Long, Long, java.sql.Date, java.sql.Date, Long, Long)]
      .collect().toSeq
      .map(r => (r._1, r._2, r._3.toString, r._4.toString, r._5, r._6))
    assert(out == Seq(
      (1L, 1L, "2020-01-01", "2020-01-06", 3L, 5L),
      (1L, 2L, "2020-01-10", "2020-01-12", 1L, 2L)))
  }

  test("interval merge: customers are independent islands") {
    val rows = Seq(ord(1, 1, "2020-01-01"), ord(2, 2, "2020-01-02"))
    val out = Islands.mergeOrderIntervals(rows.toDF(ordCols: _*))
      .select("custkey", "island").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L)))
  }
}
