package graft.relational

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential property test for the strict-order funnel: on random event
  * sets the join-chained pipeline must equal a sequential per-user scan.
  */
class FunnelsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val eventGen: Gen[(Long, String, Long)] = for {
    user <- Gen.chooseNum(1L, 12L)
    typ <- Gen.oneOf("view", "click", "purchase", "other")
    t <- Gen.chooseNum(0L, 2000L)
  } yield (user, typ, t)

  /** Sequential reference: walk each user's events in (ts, arbitrary but
    * fixed) order and advance the stage machine on strict ts increase.
    */
  private def ref(events: Seq[(Long, String, Long)]): Map[Long, (Option[Long], Option[Long], Option[Long], Int)] =
    events.groupBy(_._1).flatMap { case (u, es) =>
      val t1 = es.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(v => es.filter(e => e._2 == "click" && e._3 > v).map(_._3).minOption)
      val t3 = t2.flatMap(c => es.filter(e => e._2 == "purchase" && e._3 > c).map(_._3).minOption)
      t1.map(_ => u -> (t1, t2, t3, if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1))
    }

  test("funnel3 equals the sequential reference on random event sets") {
    (1L to 6L).foreach { seed =>
      val events = sample(Gen.listOfN(150, eventGen), seed).distinct
      val df = events
        .map(e => (e._1, e._2, new java.sql.Timestamp(e._3 * 1000)))
        .toDF("user_id", "event_type", "ts")
      val got = Funnels.funnel3(df, "view", "click", "purchase")
        .collect().map { r =>
          def o(i: Int) = Option(r.getTimestamp(i)).map(_.getTime / 1000)
          r.getLong(0) -> ((o(1), o(2), o(3), r.getInt(4)))
        }.toMap
      assert(got == ref(events), s"seed=$seed")
    }
  }
}
