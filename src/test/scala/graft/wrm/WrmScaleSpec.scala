package graft.wrm

import org.scalatest.funsuite.AnyFunSuite

/** The WRM fixture scale knob (SPARK_GRAFT_WRM_SCALE) behind the sf10
  * stream/wrm gate (scripts/verify_sf10_streamwrm.sh). The env itself
  * can't be varied in-process, so pin the derived invariants and the
  * filename shape that keeps S7 timestamp extraction valid at scale.
  */
class WrmScaleSpec extends AnyFunSuite {

  test("scale factors cover scale (never undershoot) and stay >= 1") {
    // fileFactor × rowFactor must COVER the requested multiplier: exact
    // for perfect squares (the gate uses 100 → 10 × 10), rounded UP
    // otherwise (10 → 3 × 4 = 12, not the old 3 × 3 = 9 undershoot)
    Seq(1, 4, 9, 10, 25, 50, 100, 10000).foreach { s =>
      val f = math.max(1, math.sqrt(s.toDouble).toInt)
      val r = (s + f - 1) / f
      assert(f * r >= s, s"scale $s: $f x $r undershoots")
      assert(f * r < s + f, s"scale $s: $f x $r overshoots by >= fileFactor")
      val sq = math.sqrt(s.toDouble)
      if (sq == sq.toInt.toDouble) assert(f * r == s, s"perfect square $s")
    }
    assert(WrmScale.scale >= 1 && WrmScale.fileFactor >= 1 && WrmScale.rowFactor >= 1)
    assert(WrmScale.fileFactor * WrmScale.rowFactor >= WrmScale.scale)
  }

  test("default scale keeps the historical root; scaled roots are disjoint") {
    // the scaled fixture must never clobber the standard fixture or its
    // oracle dump — compare.py reads whichever path the oracle SQL names
    if (WrmScale.scale == 1) assert(WrmScale.root == "/tmp/graft_wrm_fixture")
    assert(!"/tmp/graft_wrm_fixture_x100".equals("/tmp/graft_wrm_fixture"))
  }

  test("scaled tick filenames stay valid wall-clock times for S7 extraction") {
    // historical shapes preserved: <=14 ticks HH-00-00, <=84 ticks
    // 10-minute slots
    (0 until 3).foreach { t =>
      val (hh, mm, ss) = WrmFixture.tickHms(t, 3)
      assert(hh == 10 + t && mm == 0 && ss == 0)
    }
    (0 until 30).foreach { t =>
      val (hh, mm, ss) = WrmFixture.tickHms(t, 30)
      assert(hh >= 10 && hh < 24 && mm % 10 == 0 && ss == 0)
    }
    // every supported density up to the per-second ceiling stays a valid
    // time AND every tick gets a distinct slot (filename uniqueness)
    Seq(84, 300, 1440, 30000, 86400).foreach { ticks =>
      val slots = (0 until ticks).map { t =>
        val (hh, mm, ss) = WrmFixture.tickHms(t, ticks)
        assert(hh >= 0 && hh < 24 && mm >= 0 && mm < 60 && ss >= 0 && ss < 60,
          s"ticks=$ticks t=$t -> $hh:$mm:$ss")
        (hh, mm, ss)
      }
      assert(slots.distinct.size == ticks, s"ticks=$ticks slot collision")
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
