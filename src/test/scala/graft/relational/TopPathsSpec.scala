package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class TopPathsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String) =
    (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("paths order by event time, cap at depth, and rank by frequency") {
    val rows = Seq(
      // two users share view>click>purchase on their day
      ev(1, 1, "2020-01-01 10:00:00", "view"),
      ev(2, 1, "2020-01-01 10:01:00", "click"),
      ev(3, 1, "2020-01-01 10:02:00", "purchase"),
      ev(4, 2, "2020-01-01 11:00:00", "view"),
      ev(5, 2, "2020-01-01 11:01:00", "click"),
      ev(6, 2, "2020-01-01 11:02:00", "purchase"),
      // user 3: five events -> path truncates to first 4
      ev(7, 3, "2020-01-02 09:00:00", "t1"),
      ev(8, 3, "2020-01-02 09:01:00", "t2"),
      ev(9, 3, "2020-01-02 09:02:00", "t3"),
      ev(10, 3, "2020-01-02 09:03:00", "t4"),
      ev(11, 3, "2020-01-02 09:04:00", "t5"))
      .toDF(cols: _*)
    val out = TopPaths.topPaths(rows, depth = 4, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out.head == (("view>click>purchase", 2L)))
    assert(out.contains(("t1>t2>t3>t4", 1L)))
    assert(!out.exists(_._1.contains("t5")))
  }

  test("same-timestamp events break ties by event_id") {
    val rows = Seq(
      ev(2, 1, "2020-01-01 10:00:00", "second"),
      ev(1, 1, "2020-01-01 10:00:00", "first"))
      .toDF(cols: _*)
    val out = TopPaths.topPaths(rows, depth = 4, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("first>second", 1L)))
  }
}
