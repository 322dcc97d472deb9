package graft.wrm

import org.scalatest.funsuite.AnyFunSuite

/** The WRM fixture scale knob (SPARK_GRAFT_WRM_SCALE) behind the sf10
  * stream/wrm gate (scripts/verify_sf10_streamwrm.sh). The env itself
  * can't be varied in-process, so pin the derived invariants and the
  * filename shape that keeps S7 timestamp extraction valid at scale.
  */
class WrmScaleSpec extends AnyFunSuite {

  test("scale factors multiply to ~scale and stay >= 1") {
    // fileFactor × rowFactor must cover the requested multiplier within
    // the integer-sqrt remainder (exact for perfect squares — the gate
    // uses 100 → 10 × 10)
    Seq(1, 4, 9, 25, 100).foreach { s =>
      val f = math.max(1, math.sqrt(s.toDouble).toInt)
      val r = math.max(1, s / f)
      assert(f * r == s, s"scale $s: $f x $r")
    }
    assert(WrmScale.scale >= 1 && WrmScale.fileFactor >= 1 && WrmScale.rowFactor >= 1)
    assert(WrmScale.fileFactor * WrmScale.rowFactor <= WrmScale.scale)
  }

  test("default scale keeps the historical root; scaled roots are disjoint") {
    // the scaled fixture must never clobber the standard fixture or its
    // oracle dump — compare.py reads whichever path the oracle SQL names
    if (WrmScale.scale == 1) assert(WrmScale.root == "/tmp/graft_wrm_fixture")
    assert(!"/tmp/graft_wrm_fixture_x100".equals("/tmp/graft_wrm_fixture"))
  }

  test("scaled tick filenames stay valid wall-clock times for S7 extraction") {
    // up to 14 ticks/date: historical HH-00-00 (hours 10..23); beyond:
    // 10-minute slots, 6/hour — hour must stay < 24 for the gate's 30
    // ticks/date and well past it
    def hhmm(t: Int, ticksPerDate: Int): (Int, Int) =
      if (ticksPerDate <= 14) (10 + t, 0) else (10 + t / 6, (t % 6) * 10)
    (0 until 3).foreach { t =>
      val (hh, mm) = hhmm(t, 3); assert(hh == 10 + t && mm == 0)
    }
    (0 until 30).foreach { t =>
      val (hh, mm) = hhmm(t, 30)
      assert(hh >= 10 && hh < 24 && mm >= 0 && mm < 60 && mm % 10 == 0)
    }
    // 84 ticks/date (the 6/hour × 14h ceiling) still valid
    (0 until 84).foreach { t =>
      val (hh, _) = hhmm(t, 84); assert(hh < 24)
    }
  }

  test("payload row counts scale with n/nBikes and ticks stay date-disjoint") {
    val p = WrmFixture.payload(0, n = 16, nBikes = 8)
    assert(p.split("\n").length == 1 + 16 + 8) // header + stations + bikes
    // date index d uses tick base d*100: no epoch collision between dates
    // for up to 100 ticks/date
    val t1 = WrmFixture.payload(99).linesIterator.drop(1).next()
    val t2 = WrmFixture.payload(100).linesIterator.drop(1).next()
    assert(t1 != t2)
  }
}
