package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval concurrency: sweep line over overlapping intervals") {
    val iv = Seq(
      (d("2020-01-01"), d("2020-01-03")),
      (d("2020-01-02"), d("2020-01-05")),
      (d("2020-01-02"), d("2020-01-03")))
      .toDF("s", "e")
    val out = TimeSeries.intervalConcurrency(iv)
      .select("d", "concurrent").as[(Timestamp, Long)].collect().toSeq
    assert(out === Seq(
      t("2020-01-01") -> 1L, // [1,3)
      t("2020-01-02") -> 3L, // +2 opens
      t("2020-01-03") -> 1L, // two close
      t("2020-01-05") -> 0L)) // sweep always returns to zero
  }

  test("gap fill: silent days appear with null total and carried-forward fill") {
    val ev = Seq(
      (1L, ts("2020-01-01 10:00:00"), "purchase", 5.0, 1L),
      (1L, ts("2020-01-01 11:00:00"), "purchase", 3.0, 2L),
      (1L, ts("2020-01-04 09:00:00"), "purchase", 7.0, 3L),
      (1L, ts("2020-01-02 09:00:00"), "view", 9.0, 4L)) // other types excluded
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = TimeSeries.gapFillDaily(ev, "purchase")
      .select("d", "day_total", "filled")
      .as[(Timestamp, Option[Double], Double)].collect().toSeq
    assert(out === Seq(
      (t("2020-01-01"), Some(8.0), 8.0),
      (t("2020-01-02"), None, 8.0), // gap day: LOCF
      (t("2020-01-03"), None, 8.0),
      (t("2020-01-04"), Some(7.0), 7.0)))
  }

  test("ohlc: open/close by (ts, event_id) order, same-ts tie broken by id") {
    val ev = Seq(
      (1L, ts("2020-01-01 09:00:00"), "purchase", 10.0, 2L),
      (1L, ts("2020-01-01 09:00:00"), "purchase", 11.0, 1L), // same ts, lower id → open
      (1L, ts("2020-01-01 15:00:00"), "purchase", 2.0, 3L),
      (1L, ts("2020-01-01 17:00:00"), "purchase", 7.0, 4L))
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = TimeSeries.ohlcBars(ev, "purchase")
      .select("open", "high", "low", "close", "n_events", "total")
      .as[(Double, Double, Double, Double, Long, Double)].collect().toSeq
    assert(out === Seq((11.0, 11.0, 2.0, 7.0, 4L, 30.0)))
  }

  test("twap: interval weights, last observation carries none") {
    // value 10 for 3600 s, then 20 for 1800 s, final value 99 unweighted:
    // twap = (10*3600 + 20*1800) / 5400 = 72000/5400 = 13.333...
    val ev = Seq(
      (1L, ts("2020-01-01 09:00:00"), "view", 10.0, 1L),
      (1L, ts("2020-01-01 10:00:00"), "view", 20.0, 2L),
      (1L, ts("2020-01-01 10:30:00"), "view", 99.0, 3L),
      (2L, ts("2020-01-01 09:00:00"), "view", 5.0, 4L)) // single event: no interval
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = TimeSeries.twap(ev, "view")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L)) // user 2 has no interval -> dropped
    val (_, n, span, twap) = out.head
    assert(n == 2L && span == 5400L * 1000000L)
    assert(math.abs(twap - 72000.0 / 5400.0) < 1e-9)
    // unweighted mean would be (10+20)/2 = 15: the burst correction is real
    assert(twap < 15.0)
  }
}
