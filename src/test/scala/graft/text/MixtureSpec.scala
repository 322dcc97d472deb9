package graft.text

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mixture resample: kept proportions track targets, bottleneck source kept whole") {
    // a: 300 docs, b: 300, c: 60; targets 1:1:1 -> c is the bottleneck
    // (scale = 60), so c keeps ALL its docs and a/b keep ~60 each
    val docs = ((0L until 300L).map(i => (i, "a")) ++
      (1000L until 1300L).map(i => (i, "b")) ++
      (2000L until 2060L).map(i => (i, "c")))
      .toDF("doc_id", "source")
    val kept = Mixture.mixtureResample(docs, Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .as[(Long, String)].collect().toSeq
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("c") == 60) // keep fraction exactly 1.0
    assert(bySrc("a") > 40 && bySrc("a") < 80) // hash-uniform ~60
    assert(bySrc("b") > 40 && bySrc("b") < 80)
    // deterministic: identical kept set on re-run
    val again = Mixture.mixtureResample(docs, Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .as[(Long, String)].collect().toSeq
    assert(again == kept)
  }

  test("mixture resample: unlisted sources are dropped, bad targets rejected") {
    val docs = Seq((1L, "a"), (2L, "zzz")).toDF("doc_id", "source")
    val kept = Mixture.mixtureResample(docs, Map("a" -> 1.0))
      .as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "a")))
    intercept[IllegalArgumentException] {
      Mixture.mixtureResample(docs, Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mixture.mixtureResample(docs, Map("a" -> 0.0))
    }
  }

  test("source diversity: monoculture vs uniform mixture") {
    // lang "mono": one source -> hhi 1, effective 1, top share 1
    // lang "mix": 4 sources x 2 docs -> hhi 1/4, effective 4, top 1/4
    val docs = (Seq.fill(3)(("mono", "only")) ++
      (for (s <- 1 to 4; _ <- 1 to 2) yield ("mix", s"s$s")))
      .toDF("lang", "source")
    val out = Mixture.sourceDiversity(docs)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("mono") == (("mono", 3L, 1L, 1.0, 1.0, 1.0)))
    assert(out("mix") == (("mix", 8L, 4L, 0.25, 0.25, 4.0)))
  }
}
