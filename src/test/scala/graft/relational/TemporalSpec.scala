package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String = "view") =
    (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gap histogram: per-user gaps, power-of-two second buckets") {
    // user 1: gaps of 1s (bucket 1), 3s (bucket 4); user 2: no gap
    val rows = Seq(
      ev(1, 1, "2020-01-01 00:00:00"),
      ev(2, 1, "2020-01-01 00:00:01"),
      ev(3, 1, "2020-01-01 00:00:04"),
      ev(4, 2, "2020-01-01 09:00:00"))
    val out = Temporal.gapHistogram(rows.toDF(cols: _*))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("view", 1L, 1L), ("view", 4L, 1L)))
  }

  test("gap histogram: zero gaps land in bucket 1, type from the earlier event") {
    val rows = Seq(
      ev(1, 1, "2020-01-01 00:00:00", "a"),
      ev(2, 1, "2020-01-01 00:00:00", "b")) // tie -> order by event_id
    val out = Temporal.gapHistogram(rows.toDF(cols: _*))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 1L, 1L)))
  }

  test("daily anomalies: a spike day is flagged against median/MAD") {
    // type "a": 5 normal days of ~2 events + one 40-event day
    val normal = for (d <- 1 to 5; i <- 1 to 2)
      yield ev((d * 10 + i).toLong, i.toLong, f"2020-01-0$d 09:00:$i%02d", "a")
    val spike = (1 to 40).map(i =>
      ev((1000 + i).toLong, i.toLong, f"2020-01-06 10:00:${i % 60}%02d", "a"))
    val out = Temporal.dailyAnomalies((normal ++ spike).toDF(cols: _*), z = 3.0)
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(out.size == 1)
    val (_, med, _, nRows, nOutliers) = out.head
    assert(med == 2.0 && nRows == 6L && nOutliers == 1L)
  }

  test("weekly profile: weekday 0 is Monday, hours split correctly") {
    // 2020-01-06 is a Monday
    val rows = Seq(
      ev(1, 1, "2020-01-06 09:30:00"),
      ev(2, 2, "2020-01-06 09:45:00"),
      ev(3, 1, "2020-01-12 23:00:00")) // Sunday
    val out = Temporal.weeklyProfile(rows.toDF(cols: _*))
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(out == Set((0, 9, 2L, 2L), (6, 23, 1L, 1L)))
  }

  test("freshness: lag vs the freshest stream, trailing-day volume") {
    val rows = Seq(
      ev(1, 1, "2020-01-10 00:00:00"),          // freshest stream (view)
      ev(2, 1, "2020-01-09 12:00:00"),          // inside trailing day
      ev(3, 1, "2020-01-08 00:00:00"),          // outside
      ev(4, 1, "2020-01-09 06:00:00", "click")) // 18h stale, inside window
    val out = Temporal.freshnessReport(rows.toDF(cols: _*))
      .selectExpr("event_type", "n_events", "lag_us", "n_last_day")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("view") == ((3L, 0L, 2L)))
    assert(out("click") == ((1L, 18L * 3600 * 1000000, 1L)))
  }
}
