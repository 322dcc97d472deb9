package graft.relational

import graft.SparkSpec
import java.sql.Timestamp

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String) =
    (id, new Timestamp(id * 1000L), user, typ, 1.0, "{}")

  test("chi-square: hand-computed 2x2 contingency") {
    // cohort A = even user_id. Events:
    //   A: 3 "buy", 1 "view"   -> a=3, b=1 for "buy"
    //   B: 1 "buy", 3 "view"   -> c=1, d=3 for "buy"
    // chi2(buy) = N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    //           = 8*(9-1)^2 / (4*4*4*4) = 512/256 = 2.0
    // lift(buy) = (3/4)/(1/4) = 3.0
    val rows = Seq(
      ev(1, 2, "buy"), ev(2, 4, "buy"), ev(3, 6, "buy"), ev(4, 2, "view"),
      ev(5, 1, "buy"), ev(6, 3, "view"), ev(7, 5, "view"), ev(8, 7, "view"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AbTest.chiSquare(df)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, na, nb, chi2, lift) = out("buy")
    assert(na == 3L && nb == 1L)
    assert(chi2 == 2.0)
    assert(lift == 3.0)
    // "view" is the complementary split: same chi2, inverse lift
    assert(out("view")._4 == 2.0)
    assert(out("view")._5 == (1.0 / 4.0) / (3.0 / 4.0))
  }

  test("chi-square: independent split gives statistic 0") {
    // both cohorts see the same type mix -> ad = bc -> chi2 0, lift 1
    val rows = Seq(
      ev(1, 2, "buy"), ev(2, 4, "view"), ev(3, 1, "buy"), ev(4, 3, "view"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AbTest.chiSquare(df)
      .as[(String, Long, Long, Double, Double)].collect()
    out.foreach { r => assert(r._4 == 0.0 && r._5 == 1.0) }
  }
}
