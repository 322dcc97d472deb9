package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String) =
    (id, Timestamp.valueOf(t), user, typ, 1.0, "{}")

  test("transitions: per-user sequences, probabilities normalize per from-type") {
    // user 1: view -> view -> buy ; user 2: view -> buy
    // from 'view': view->view 1, view->buy 2 => P = 1/3, 2/3
    val rows = Seq(
      ev(1, 1, "2020-01-01 09:00:00", "view"),
      ev(2, 1, "2020-01-01 09:01:00", "view"),
      ev(3, 1, "2020-01-01 09:02:00", "buy"),
      ev(4, 2, "2020-01-01 09:00:00", "view"),
      ev(5, 2, "2020-01-01 09:05:00", "buy"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Transitions.eventTransitions(rows)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.toSet == Set(
      ("view", "buy", 2L, 2.0 / 3.0),
      ("view", "view", 1L, 1.0 / 3.0)))
    // sequences never cross users: no buy->view from user1.buy to user2.view
    assert(!out.exists(r => r._1 == "buy"))
  }

  test("transitions: same-timestamp ties break on event_id") {
    val rows = Seq(
      ev(2, 1, "2020-01-01 09:00:00", "b"),
      ev(1, 1, "2020-01-01 09:00:00", "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Transitions.eventTransitions(rows)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 1.0)))
  }
}
