package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2: consecutive equal attributes collapse; ranges chain; last version open") {
    val ev = Seq(
      (1L, "free", ts(10), 1L), (1L, "free", ts(20), 2L), // re-statement, not a version
      (1L, "pro", ts(30), 3L), (1L, "free", ts(40), 4L),
      (2L, "pro", ts(5), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Cdc.scd2History(ev)
      .select("user_id", "attr", "version", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Int, Timestamp, Option[Timestamp], Boolean)].collect().toSet
    assert(out === Set(
      (1L, "free", 1, ts(10), Some(ts(30)), false),
      (1L, "pro", 2, ts(30), Some(ts(40)), false),
      (1L, "free", 3, ts(40), None, true),
      (2L, "pro", 1, ts(5), None, true)))
  }

  test("scd2: same-ts events order by event_id (total order, partitioning-independent)") {
    val ev = Seq((1L, "a", ts(10), 2L), (1L, "b", ts(10), 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Cdc.scd2History(ev).select("attr", "version")
      .as[(String, Int)].collect().toSet
    assert(out === Set(("b", 1), ("a", 2))) // event_id 1 first
  }

  test("cdc merge: latest op wins — delete drops, upsert updates/inserts, rest unchanged") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("c_custkey", "c_acctbal")
    val ch = Seq(
      (2L, "U", 99.0, ts(10), 1L), // update existing
      (3L, "U", 77.0, ts(10), 2L), (3L, "D", 0.0, ts(20), 3L), // then deleted
      (5L, "I", 55.0, ts(10), 4L), // insert new key
      (6L, "I", 66.0, ts(10), 5L), (6L, "D", 0.0, ts(20), 6L)) // insert then delete
      .toDF("key", "op", "newval", "ts", "event_id")
    val out = Cdc.cdcMerge(base, ch)
      .as[(Long, Double, String)].collect().toSet
    assert(out === Set(
      (1L, 10.0, "unchanged"), (2L, 99.0, "updated"),
      (4L, 40.0, "unchanged"), (5L, 55.0, "inserted")))
  }

  test("cdc merge: ts tie broken by event_id desc (the later id is the later change)") {
    val base = Seq((1L, 10.0)).toDF("c_custkey", "c_acctbal")
    val ch = Seq((1L, "U", 2.0, ts(10), 1L), (1L, "U", 3.0, ts(10), 2L))
      .toDF("key", "op", "newval", "ts", "event_id")
    val out = Cdc.cdcMerge(base, ch).as[(Long, Double, String)].collect().toSet
    assert(out === Set((1L, 3.0, "updated")))
  }

  test("cdc merge: keep-latest plans as WindowGroupLimit (map-side pre-trim)") {
    val plan = Cdc.cdcMerge(
      graft.Tables.customer(spark, "/root/testdata/sf0.001")
        .select(col("c_custkey"), col("c_acctbal")),
      Cdc.eventChangelog(graft.Tables.events(spark, "/root/testdata/sf0.001")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("scd2 audit: sound history is all-zero; each corruption class is caught") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val cols = Seq("user_id", "version", "valid_from", "valid_to", "is_current")
    val sound = Seq(
      (1L, 1, t("2020-01-01 00:00:00"), Some(t("2020-02-01 00:00:00")), false),
      (1L, 2, t("2020-02-01 00:00:00"), None, true)).toDF(cols: _*)
    val ok = Cdc.scd2Audit(sound)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(ok == ((1L, 2L, 0L, 0L, 0L, 0L)))
    val broken = Seq(
      // inverted range
      (2L, 1, t("2020-03-01 00:00:00"), Some(t("2020-01-01 00:00:00")), false),
      // gap: valid_to 2020-04 but next starts 2020-05; also two currents
      (2L, 2, t("2020-03-01 00:00:00"), Some(t("2020-04-01 00:00:00")), true),
      (2L, 3, t("2020-05-01 00:00:00"), None, true),
      // version sequence 2..3 (no 1)
      (3L, 2, t("2020-01-01 00:00:00"), Some(t("2020-02-01 00:00:00")), false),
      (3L, 3, t("2020-02-01 00:00:00"), None, true)).toDF(cols: _*)
    val bad = Cdc.scd2Audit(broken)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nKeys, nVer, inverted, discontig, badCurrent, verGaps) = bad
    assert((nKeys, nVer) == ((2L, 5L)))
    assert(inverted == 1L)
    assert(discontig >= 1L) // the 2020-04 -> 2020-05 gap
    assert(badCurrent == 1L) // key 2 has two open versions
    assert(verGaps == 1L) // key 3 numbered 2..3
  }
}
