package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join on a hand-computed fixture (inclusive time, left outer)") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 15L, "p3"), (3L, 5L, "p4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "a"), (1L, 18L, "b"), (1L, 20L, "c"), (2L, 99L, "z"))
      .toDF("rk", "rt", "rtag")
    val out = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "tag", "rt", "rtag").orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, "p1", 5L, "a"),    // 5 <= 10 < 18
      (1L, 20L, "p2", 20L, "c"),   // inclusive: 20 <= 20
      (2L, 15L, "p3", -1L, null),  // only right is at 99 > 15
      (3L, 5L, "p4", -1L, null)))  // no right key 3
  }

  test("NULL times never match, on both merge and broadcast paths (ASOF semantics)") {
    // DuckDB ASOF `l.t >= r.t` is never true when either side is NULL;
    // natural ascending ordering would otherwise sort NULL first and make
    // a NULL-time right row a candidate for every left row.
    val left = Seq((1L, Some(10L), "p1"), (1L, None, "pNull"), (2L, Some(5L), "p2"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, None, "rNull"), (1L, Some(8L), "r8"), (2L, None, "rNull2"))
      .toDF("rk", "rt", "rtag")
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val out = df.select("k", "tag", "rtag").orderBy("k", "tag")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(out.toSeq == Seq(
        (1L, "p1", "r8"),      // 8 <= 10; the NULL-time right row is skipped
        (1L, "pNull", null),   // NULL left time matches nothing
        (2L, "p2", null)))     // key 2's only right row has NULL time
    }
    check(AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")) // broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try check(AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt")) // merge
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join matches a window-based reference implementation on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("view_event_id"),
        col("ts").as("view_ts"))

    val got = AsOf.join(purchases, views, Seq("user_id"), Seq("vu"), "ts", "view_ts")
      .select(col("event_id"), col("view_event_id"))
      .as[(Long, Option[Long])].collect().toMap

    // reference: plain join + filter + max_by (quadratic per key, fine at test size)
    val expected = purchases.join(views,
        col("user_id") === col("vu") && col("view_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("view_event_id"), struct(col("view_ts"), col("view_event_id"))).as("w"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("small right side takes the broadcast path; both paths agree") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("ve"), col("ts").as("vts"))
    def run() = AsOf.join(l, r, Seq("user_id"), Seq("vu"), "ts", "vts",
      rightTiebreak = Seq("ve"))

    // default threshold (10m) → tiny right side broadcasts
    val bPlan = run().queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsOfJoin"), s"expected broadcast path:\n$bPlan")
    val bRes = run().select("event_id", "ve").as[(Long, Option[Long])].collect().toMap

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val mPlan = run().queryExecution.executedPlan.toString
      assert(mPlan.contains("AsOfJoin") && !mPlan.contains("BroadcastAsOfJoin"),
        s"expected merge path:\n$mPlan")
      val mRes = run().select("event_id", "ve").as[(Long, Option[Long])].collect().toMap
      assert(bRes == mRes)
      assert(bRes.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join merge-path plan shape: two shuffles, sorted merge, no cartesian") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force merge path
    try {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      val l = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val r = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("ve"), col("ts").as("vts"))
      val plan = AsOf.join(l, r, Seq("user_id"), Seq("vu"), "ts", "vts")
        .queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"))
      assert(plan.contains("Exchange hashpartitioning"))
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
