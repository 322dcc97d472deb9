package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join: equivalence with the naive
  * inequality join, bucket-boundary exactness, contract enforcement, and
  * the plan shape that makes it scale (equi-join keys carry the cell).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    // (key, point_ts, id)
    (1L, "2024-01-01 00:00:00", 10L), // exactly on a window start
    (1L, "2024-01-01 00:59:59", 11L), // just inside
    (1L, "2024-01-01 01:00:00", 12L), // exactly on the window end (inclusive)
    (1L, "2024-01-01 01:00:01", 13L), // just outside
    (1L, "2024-01-01 03:30:00", 14L), // straddles a cell boundary vs window 2
    (2L, "2024-01-01 00:30:00", 20L), // right key-time, wrong key
    (3L, "2024-01-01 00:30:00", 30L)  // key with no intervals
  ).toDF("k", "p_ts", "pid").withColumn("p_ts", to_timestamp(col("p_ts")))

  private val intervals = Seq(
    (1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 100L),
    (1L, "2024-01-01 03:00:00", "2024-01-01 04:00:00", 101L), // crosses the 1h-cell boundary at 03:30? no — covers cells 3 and 4
    (2L, "2024-01-01 02:00:00", "2024-01-01 03:00:00", 200L)
  ).toDF("ik", "s_ts", "e_ts", "iid")
    .withColumn("s_ts", to_timestamp(col("s_ts")))
    .withColumn("e_ts", to_timestamp(col("e_ts")))

  private def naive = points.join(intervals,
      col("k") === col("ik") && col("p_ts") >= col("s_ts") && col("p_ts") <= col("e_ts"))
    .select(col("pid"), col("iid")).orderBy(col("pid"), col("iid"))

  test("bucketed range join equals the naive inequality join (boundaries inclusive)") {
    val got = RangeJoin.pointInInterval(points, intervals,
        Seq("k" -> "ik"), "p_ts", "s_ts", "e_ts", maxSpan = "1 HOUR")
      .select(col("pid"), col("iid")).orderBy(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSeq
    val want = naive.as[(Long, Long)].collect().toSeq
    assert(got == want)
    // sanity on the fixture itself: inclusive ends, key isolation
    assert(want.contains((10L, 100L)) && want.contains((12L, 100L)))
    assert(!want.exists(_._1 == 13L) && !want.exists(_._1 == 20L))
    assert(want.contains((14L, 101L)))
  }

  test("no duplicate pairs when an interval spans two cells") {
    // wide cells (maxSpan = 4h) put window 101 fully inside one cell;
    // narrow cells (1h) split it — both must yield each pair exactly once
    for (span <- Seq("1 HOUR", "4 HOURS")) {
      val got = RangeJoin.pointInInterval(points, intervals,
          Seq("k" -> "ik"), "p_ts", "s_ts", "e_ts", maxSpan = span)
        .groupBy(col("pid"), col("iid")).count()
        .filter(col("count") > 1).count()
      assert(got == 0, s"duplicates at maxSpan=$span")
    }
  }

  test("interval wider than maxSpan fails fast instead of losing matches") {
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals,
          Seq("k" -> "ik"), "p_ts", "s_ts", "e_ts", maxSpan = "30 MINUTES")
        .count()
    }
    assert(ex.getMessage != null)
  }

  test("property: random points/intervals — bucketed join equals naive join at every maxSpan") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // offsets in seconds over a 2-day span; keys from a small set so
    // every key has many points AND many intervals (the hot-key case)
    val pointGen = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 172800L))
    val ivGen = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 172800L), Gen.choose(0L, 3600L))
    val pts = samples(pointGen, 300, 1L).zipWithIndex.map { case ((k, off), i) =>
      (k, new java.sql.Timestamp(base + off * 1000), i.toLong)
    }.toDF("k", "p_ts", "pid")
    val ivs = samples(ivGen, 150, 9999L).zipWithIndex.map { case ((k, off, len), i) =>
      (k, new java.sql.Timestamp(base + off * 1000),
        new java.sql.Timestamp(base + (off + len) * 1000), i.toLong)
    }.toDF("ik", "s_ts", "e_ts", "iid")
    val want = pts.join(ivs,
        col("k") === col("ik") && col("p_ts") >= col("s_ts") && col("p_ts") <= col("e_ts"))
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty) // the generator must actually produce matches
    for (span <- Seq("1 HOUR", "90 MINUTES", "1 DAY")) {
      val got = RangeJoin.pointInInterval(pts, ivs,
          Seq("k" -> "ik"), "p_ts", "s_ts", "e_ts", maxSpan = span)
        .select(col("pid"), col("iid"))
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at maxSpan=$span")
      assert(got.toSet == want, s"mismatch at maxSpan=$span")
    }
  }

  test("plan is an equi-join on (key, cell) — no BroadcastNestedLoop/Cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        Seq("k" -> "ik"), "p_ts", "s_ts", "e_ts", maxSpan = "1 HOUR")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
