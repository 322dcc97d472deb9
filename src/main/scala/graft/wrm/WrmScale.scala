package graft.wrm

/** Scale knob for the WRM fixture family (VERDICT r14 item 2: the wrm_*
  * rows were the one registry surface never gated above fixture size).
  *
  * `SPARK_GRAFT_WRM_SCALE=R` multiplies the raw-snapshot corpus by R along
  * the two realistic axes at once — more snapshot files per date (the
  * reference polls every 30 s; a denser poll schedule) and more stations
  * per snapshot (a bigger bike system): `fileFactor × rowFactor ≥ R`,
  * both ~√R (rowFactor rounds UP, so a non-perfect-square R never
  * under-delivers — R=10 gives 3×4=12×, not 3×3=9×). Same calendar
  * window, ≥R× the rows — density growth, matching [[graft.ScaleUp]]'s
  * philosophy for the relational tables.
  *
  * Scaled fixtures live under their own root (`/tmp/graft_wrm_fixture_xR`)
  * so a scaled run never clobbers the standard fixture or its oracle dump;
  * the oracle SQL strings are built from [[root]] at object init, so the
  * Verify process and the compare.py process that reads its oracle_sql.json
  * agree on the path by construction.
  */
object WrmScale {
  val scale: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_WRM_SCALE", "1").toInt)

  // ticksPerDate = 3·fileFactor must fit a single day's worth of
  // per-second filename slots (86400) for S7 timestamp extraction —
  // sqrt(1e8)·3 ≈ 30000 < 86400, so 1e8 is the safe ceiling.
  require(scale <= 100000000,
    s"SPARK_GRAFT_WRM_SCALE=$scale exceeds the supported range (<= 1e8): " +
      "ticksPerDate would overflow one day's filename timestamps")

  val root: String =
    if (scale == 1) "/tmp/graft_wrm_fixture"
    else s"/tmp/graft_wrm_fixture_x$scale"

  /** Multiplier on snapshot files per date. */
  val fileFactor: Int = math.max(1, math.sqrt(scale.toDouble).toInt)

  /** Multiplier on stations/bikes per snapshot (rounds up: the pair must
    * COVER the requested scale, never undershoot it). */
  val rowFactor: Int = (scale + fileFactor - 1) / fileFactor
}
