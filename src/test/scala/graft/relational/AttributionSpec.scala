package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val Day = 86400000000L

  private def ev(rows: (Long, String, Long, Double, Long)*) =
    rows.map { case (u, t, sec, v, id) => (u, t, ts(sec), v, id) }
      .toDF("user_id", "event_type", "ts", "value", "event_id")

  test("attribution: purchase credits the most recent preceding click") {
    val out = Attribution.lastTouchAttribution(ev(
      (1L, "click", 10, 0.0, 1L),
      (1L, "click", 20, 0.0, 2L),
      (1L, "purchase", 30, 9.0, 3L),
      (1L, "purchase", 40, 5.0, 4L)), // same click credited again
      lookbackUs = Day)
      .select("purchase_id", "click_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(out === Set((3L, Some(2L), true), (4L, Some(2L), true)))
  }

  test("attribution: clicks outside the lookback, after the purchase, or from other users don't count") {
    val out = Attribution.lastTouchAttribution(ev(
      (1L, "click", 0, 0.0, 1L),
      (1L, "purchase", 200000, 9.0, 2L), // click 200000s earlier > 1-day lookback
      (2L, "purchase", 100, 5.0, 3L), // no click at all for user 2
      (2L, "click", 150, 0.0, 4L), // click after the purchase
      (3L, "click", 90, 0.0, 5L)), // other user's click
      lookbackUs = Day)
      .select("purchase_id", "click_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(out === Set((2L, None, false), (3L, None, false)))
  }

  test("attribution: same-ts click with lower id is eligible, higher id is not") {
    val out = Attribution.lastTouchAttribution(ev(
      (1L, "click", 10, 0.0, 1L),
      (1L, "purchase", 10, 9.0, 2L), // click id 1 < purchase id 2 → eligible
      (2L, "purchase", 10, 9.0, 3L),
      (2L, "click", 10, 0.0, 4L)), // click id 4 > purchase id 3 → not yet seen
      lookbackUs = Day)
      .select("purchase_id", "click_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(out === Set((2L, Some(1L), true), (3L, None, false)))
  }
}
