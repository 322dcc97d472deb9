package graft.relational

import graft.SparkSpec

class SnapshotDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot delta: all four statuses, keyed by doc_id") {
    val oldSnap = Seq(
      (1L, "same text"),
      (2L, "old version"),
      (3L, "will be removed")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "same text"),
      (2L, "new version"),
      (4L, "brand new doc")
    ).toDF("doc_id", "text")
    val out = SnapshotDelta.snapshotDelta(oldSnap, newSnap)
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "unchanged"),
      (2L, "changed"),
      (3L, "removed"),
      (4L, "added")))
  }
}
