package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionsSpec extends SparkSpec {

  test("benford: leading digit via exact cents arithmetic, nonpositives dropped") {
    import spark.implicits._
    val df = Seq(1.00, 19.99, 0.05, 999.99, 2.50, 25.00, -3.0, 0.0).toDF("v")
    val out = Distributions.benford(df, "v").collect()
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit === Map(1 -> 2L, 2 -> 2L, 5 -> 1L, 9 -> 1L))
    // shares over the 6 positive rows; expected share is the Benford constant
    val d1 = out.find(_.getInt(0) == 1).get
    assert(d1.getDouble(2) === math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(d1.getDouble(3) === math.rint(math.log10(2.0) * 1e6) / 1e6)
  }

  test("gini: uniform revenues score 0, concentrated revenues score high") {
    import spark.implicits._
    val nation = Seq((0, "AAA"), (1, "BBB")).toDF("n_nationkey", "n_name")
    val customer = Seq((1, 0), (2, 0), (3, 0), (4, 0), (5, 1), (6, 1), (7, 1), (8, 1))
      .toDF("c_custkey", "c_nationkey")
    // nation 0: four customers at 10 each (gini 0)
    // nation 1: revenues 1,1,1,97 → (2·394 − 5·100)/(4·100) = 0.72
    val orders = Seq(
      (1, 10.0), (2, 10.0), (3, 10.0), (4, 10.0),
      (5, 1.0), (6, 1.0), (7, 1.0), (8, 90.0), (8, 7.0))
      .toDF("o_custkey", "o_totalprice")
    val out = Distributions.giniRevenue(orders, customer, nation).collect()
    val byNation = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byNation("AAA") === 0.0)
    assert(byNation("BBB") === 0.72)
    val nBBB = out.find(_.getString(0) == "BBB").get
    assert(nBBB.getLong(1) === 4L)
    assert(nBBB.getDouble(2) === 100.0)
  }

  test("cusum: constant series is flat (every day the trivial peak)") {
    import spark.implicits._
    val ts = Seq(
      "2024-01-01 01:00:00", "2024-01-01 02:00:00",
      "2024-01-02 01:00:00", "2024-01-02 02:00:00",
      "2024-01-03 01:00:00", "2024-01-03 02:00:00")
    val events = ts.toDF("s").select(to_timestamp(col("s")).as("ts"))
    val out = Distributions.cusumDailyCounts(events).collect()
    assert(out.length === 3)
    assert(out.forall(_.getDouble(2) === 0.0))
    assert(out.forall(_.getBoolean(3))) // peak of an all-zero curve is everywhere
  }

  test("cusum: step change peaks at the shift point") {
    import spark.implicits._
    // daily counts 1,1,5,5 → mean 3, deviations -2,-4,-2,0 → peak on day 2
    val ts = Seq(
      "2024-01-01 01:00:00",
      "2024-01-02 01:00:00",
      "2024-01-03 01:00:00", "2024-01-03 02:00:00", "2024-01-03 03:00:00",
      "2024-01-03 04:00:00", "2024-01-03 05:00:00",
      "2024-01-04 01:00:00", "2024-01-04 02:00:00", "2024-01-04 03:00:00",
      "2024-01-04 04:00:00", "2024-01-04 05:00:00")
    val events = ts.toDF("s").select(to_timestamp(col("s")).as("ts"))
    val out = Distributions.cusumDailyCounts(events).collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(-2.0, -4.0, -2.0, 0.0))
    assert(out.map(_.getBoolean(3)).toSeq === Seq(false, true, false, false))
  }

  test("abc: the 80/95 cumulative-share boundaries classify exactly") {
    import spark.implicits._
    // revenues 70, 20, 6, 4 (total 100): cum shares .70/.90/.96/1.00
    // -> classes A, B, C, C
    val li = Seq((1L, 70.0), (2L, 20.0), (3L, 6.0), (4L, 4.0))
      .toDF("l_partkey", "l_extendedprice")
    val out = Distributions.abcClassification(li)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("A", 1L, 70.0, 0.7), ("B", 1L, 20.0, 0.2), ("C", 2L, 10.0, 0.1)))
  }

  test("abc: a part exactly AT the 80% boundary stays in class A") {
    import spark.implicits._
    val li = Seq((1L, 80.0), (2L, 20.0)).toDF("l_partkey", "l_extendedprice")
    val out = Distributions.abcClassification(li)
      .as[(String, Long, Double, Double)].collect().toSeq
    // part 1: cum share exactly 0.80 -> A (<=); part 2: cum 1.00 -> C
    assert(out == Seq(("A", 1L, 80.0, 0.8), ("C", 1L, 20.0, 0.2)))
  }

  test("abc: the decomposed prefix-sum path is bit-identical to the flat window") {
    import spark.implicits._
    // enough parts to span several range partitions, revenues chosen so
    // class boundaries fall mid-stream; duplicate revenues exercise the
    // (rev, partkey) tiebreak across partition boundaries
    val li = (1 to 500).map(i => (i.toLong, ((i % 97) + 1) * 1.5))
      .toDF("l_partkey", "l_extendedprice")
    val flat = Distributions.abcClassification(li)
      .as[(String, Long, Double, Double)].collect().toSeq
    val decomposed = Distributions.abcClassification(li, forceDecomposed = true)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(decomposed === flat)
    assert(flat.map(_._1) === Seq("A", "B", "C"))
  }
}
