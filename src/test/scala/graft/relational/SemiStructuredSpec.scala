package graft.relational

import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  test("json extract: typed field stats, malformed payloads counted as null") {
    val ev = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("click", """not json"""), // unparseable → null
      ("view", """{"other": 1}"""), // missing field → null
      ("view", """{"k": 5}"""))
      .toDF("event_type", "props")
    val out = SemiStructured.jsonFieldStats(ev)
      .select("event_type", "n", "n_null", "k_min", "k_max", "k_sum", "k_distinct")
      .as[(String, Long, Long, Option[Int], Option[Int], Option[Long], Long)]
      .collect().toSet
    assert(out === Set(
      ("click", 2L, 1L, Some(5), Some(7), Some(12L), 2L),
      ("view", 1L, 1L, Some(5), Some(5), Some(5L), 1L)))
  }

  test("json extract: parsing is a narrow map — no shuffle before the aggregate") {
    val plan = SemiStructured.jsonFieldStats(
      graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .queryExecution.executedPlan.toString
    // exactly the aggregate's exchanges: partial→final hash agg + the
    // output-edge sort; from_json must not introduce extra shuffles
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$plan")
  }
}
