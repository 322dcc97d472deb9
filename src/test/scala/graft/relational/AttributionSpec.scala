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

  test("position attribution: 100% / 50-50 / 40-20-40 credit by touch count") {
    val out = Attribution.positionAttribution(ev(
      // user 1: four clicks then a purchase -> 0.4, 0.1, 0.1, 0.4
      (1L, "click", 10, 0.0, 1L), (1L, "click", 20, 0.0, 2L),
      (1L, "click", 30, 0.0, 3L), (1L, "click", 40, 0.0, 4L),
      (1L, "purchase", 50, 9.0, 5L),
      // user 2: two clicks -> 0.5 each
      (2L, "click", 10, 0.0, 6L), (2L, "click", 20, 0.0, 7L),
      (2L, "purchase", 30, 9.0, 8L),
      // user 3: one click -> 1.0
      (3L, "click", 10, 0.0, 9L), (3L, "purchase", 20, 9.0, 10L)),
      lookbackUs = Day)
      .select("purchase_id", "click_id", "credit")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set(
      (5L, 1L, 0.4), (5L, 2L, 0.1), (5L, 3L, 0.1), (5L, 4L, 0.4),
      (8L, 6L, 0.5), (8L, 7L, 0.5),
      (10L, 9L, 1.0)))
  }

  test("position attribution: lookback excludes stale clicks; credits re-rank") {
    // click 1 is outside the 1-day lookback -> the remaining three split 40/20/40
    val out = Attribution.positionAttribution(ev(
      (1L, "click", 0, 0.0, 1L),
      (1L, "click", 100000, 0.0, 2L), (1L, "click", 100010, 0.0, 3L),
      (1L, "click", 100020, 0.0, 4L),
      (1L, "purchase", 150000, 9.0, 5L)),
      lookbackUs = Day)
      .select("click_id", "rn", "n_touches", "credit")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set((2L, 1L, 3L, 0.4), (3L, 2L, 3L, 0.2), (4L, 3L, 3L, 0.4)))
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
