package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel3: strict ordering — events before the prior stage don't count") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: click BEFORE the first view -> chain breaks at stage 1
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: view+click, purchase before click -> stage 2
      (3L, "view", ts("2024-01-01 08:00:00")),
      (3L, "purchase", ts("2024-01-01 08:30:00")),
      (3L, "click", ts("2024-01-01 09:00:00")),
      // user 4: never views -> absent from the funnel
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnels.funnel3(events, "view", "click", "purchase")
      .select("user_id", "stage").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 3), (2L, 1), (3L, 2)))
  }

  test("event gaps: only silences above the threshold, exact micros") {
    val events = Seq(
      (1L, "e", ts("2024-01-01 00:00:00")),
      (1L, "e", ts("2024-01-01 01:00:00")), // 1h gap: below 2h threshold
      (1L, "e", ts("2024-01-01 04:00:00")), // 3h gap: reported
      (2L, "e", ts("2024-01-01 00:00:00"))  // single event: no gap
    ).toDF("user_id", "event_type", "ts")
    val out = Funnels.eventGaps(events, thresholdUs = 2L * 3600 * 1000000)
      .select("user_id", "gap_us").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L * 3600 * 1000000)))
    intercept[IllegalArgumentException] { Funnels.eventGaps(events, 0) }
  }

  test("cohort retention: offsets count distinct active users per week") {
    val events = Seq(
      (1L, "e", ts("2024-01-01 10:00:00")), // cohort week of Jan 1 (Monday)
      (1L, "e", ts("2024-01-09 10:00:00")), // active offset 1
      (1L, "e", ts("2024-01-10 10:00:00")), // same week, distinct-collapsed
      (2L, "e", ts("2024-01-02 10:00:00")), // same cohort
      (2L, "e", ts("2024-01-16 10:00:00")), // offset 2
      (3L, "e", ts("2024-01-08 10:00:00"))  // cohort of Jan 8
    ).toDF("user_id", "event_type", "ts")
    val out = Funnels.cohortRetention(events)
      .select("cohort_week", "week_offset", "n_users")
      .as[(Timestamp, Int, Long)].collect().toSeq
    assert(out == Seq(
      (ts("2024-01-01 00:00:00"), 0, 2L),
      (ts("2024-01-01 00:00:00"), 1, 1L),
      (ts("2024-01-01 00:00:00"), 2, 1L),
      (ts("2024-01-08 00:00:00"), 0, 1L)))
  }
}
