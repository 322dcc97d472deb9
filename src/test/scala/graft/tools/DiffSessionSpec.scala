package graft.tools

import graft.SparkSpec

/** Smoke coverage for the generic registry diff tool (VERDICT r15 item 7:
  * DiffSession was the only main-tree code with no test and a hardcoded
  * query pair).
  */
class DiffSessionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a query diffed against itself is empty in both directions") {
    assert(DiffSession.diff(spark, dir, "q01_pricing_summary", "q01_pricing_summary") == (0L, 0L))
  }

  test("the streaming-vs-batch dual it was built for agrees at sf0.001") {
    // the round-15 triage pair, now exercised through the generic path
    assert(DiffSession.diff(spark, dir,
      "q45_session_window", "stream_session_window") == (0L, 0L))
  }

  test("unknown names and schema mismatches fail loud") {
    val e = intercept[RuntimeException] {
      DiffSession.diff(spark, dir, "no_such_query", "q01_pricing_summary")
    }
    assert(e.getMessage.contains("unknown query 'no_such_query'"))
    val m = intercept[RuntimeException] {
      DiffSession.diff(spark, dir, "q01_pricing_summary", "q02_filter_project")
    }
    assert(m.getMessage.contains("schema mismatch"))
  }
}
