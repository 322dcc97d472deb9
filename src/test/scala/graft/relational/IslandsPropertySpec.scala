package graft.relational

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Differential property tests: proration against an exact sequential
  * allocator, and streaks against a brute-force day-set scan — the
  * distributed window pipelines must equal the obvious single-threaded
  * reference on random inputs.
  */
class IslandsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- proration ----------------------------------------------------------

  private val orderGen: Gen[(Long, Double, Seq[Double])] = for {
    key <- Gen.chooseNum(1L, 1000000L)
    total <- Gen.chooseNum(1, 500000).map(_ / 100.0)
    n <- Gen.chooseNum(1, 7)
    exts <- Gen.listOfN(n, Gen.chooseNum(1, 2000000).map(_ / 100.0))
  } yield (key, total, exts)

  private def refProrate(targetCents: Long, extCents: Seq[Long]): Seq[Long] = {
    val total = extCents.sum
    val base = extCents.map(e => targetCents * e / total)
    var leftover = targetCents - base.sum
    val order = extCents.indices
      .sortBy(i => (-(targetCents * extCents(i) % total), i))
    val bonus = Array.fill(extCents.size)(0L)
    order.foreach { i => if (leftover > 0) { bonus(i) = 1; leftover -= 1 } }
    base.zip(bonus).map { case (b, x) => b + x }
  }

  test("proration equals the sequential largest-remainder allocator") {
    (1L to 5L).foreach { seed =>
      val orders = sample(Gen.listOfN(40, orderGen), seed)
        .distinctBy(_._1)
      val oDf = orders.map { case (k, t, _) =>
        (k, 1L, "O", t, Timestamp.valueOf("2020-01-01 00:00:00"), "x")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val liDf = orders.flatMap { case (k, _, exts) =>
        exts.zipWithIndex.map { case (e, i) =>
          (k, 1L, 1L, i + 1, 1.0, e, 0.0, 0.0, "N", "O",
            Timestamp.valueOf("2020-01-02 00:00:00"))
        }
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      val got = Proration.prorate(oDf, liDf)
        .select("l_orderkey", "l_linenumber", "alloc_cents")
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      val want = orders.map { case (k, t, exts) =>
        k -> refProrate(math.round(t * 100), exts.map(e => math.round(e * 100)))
      }.toMap
      assert(got == want, s"seed $seed")
    }
  }

  // ---- streaks ------------------------------------------------------------

  private val dayGen: Gen[(Long, Int)] = for {
    user <- Gen.chooseNum(1L, 8L)
    day <- Gen.chooseNum(0, 40)
  } yield (user, day)

  private def refStreaks(days: Set[Int]): (Long, Long, Long) = {
    val sorted = days.toSeq.sorted
    val runs = sorted.foldLeft(List.empty[Int]) {
      case (len :: rest, d) if days.contains(d - 1) => (len + 1) :: rest
      case (acc, _) => 1 :: acc
    }
    (runs.max.toLong, runs.size.toLong, days.size.toLong)
  }

  // ---- weighted quantiles -------------------------------------------------

  private val wqGen: Gen[(String, Int, Int)] = for {
    g <- Gen.oneOf("a", "b", "c")
    v <- Gen.chooseNum(1, 12)
    wt <- Gen.chooseNum(1, 9)
  } yield (g, v, wt)

  /** Type-1 inverted CDF by linear scan over the expanded multiset. */
  private def refWq(rows: Seq[(Int, Long)], q: BigDecimal): Double = {
    val total = rows.map(_._2).sum
    val rank = (q * total).setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    var cum = 0L
    for ((v, w) <- rows.sortBy(_._1)) {
      cum += w
      if (cum >= rank) return v.toDouble
    }
    rows.map(_._1).max.toDouble
  }

  test("weighted quantiles equal the expanded-multiset scan") {
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(150, wqGen), seed)
      val df = rows.map { case (g, v, wt) => (g, v.toDouble, wt.toLong) }
        .toDF("g", "v", "wt")
      val got = Quantiles.weightedGroupQuantiles(df, "g", "v", "wt")
        .as[(String, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val byG = rows.groupBy(_._1).view.mapValues(rs =>
        rs.groupBy(_._2).map { case (v, g2) => v -> g2.map(_._3.toLong).sum }
          .toSeq).toMap
      for ((g, vw) <- byG; (label, q) <- Quantiles.WeightedProbes) {
        assert(got((g, label)) == refWq(vw, BigDecimal(q)),
          s"seed $seed group $g probe $label")
      }
    }
  }

  test("streaks equal the brute-force day-set scan") {
    (1L to 5L).foreach { seed =>
      val pairs = sample(Gen.listOfN(120, dayGen), seed).distinct
      val df = pairs.zipWithIndex.map { case ((u, d), i) =>
        (i.toLong, Timestamp.valueOf(f"2020-01-01 00:00:00")
          .toLocalDateTime.plusDays(d).atZone(java.time.ZoneOffset.UTC),
          u)
      }.map { case (id, zdt, u) =>
        (id, Timestamp.from(zdt.toInstant), u, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = Islands.dayStreaks(df)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = pairs.groupBy(_._1).view
        .mapValues(ds => refStreaks(ds.map(_._2).toSet)).toMap
      assert(got == want, s"seed $seed")
    }
  }
}
