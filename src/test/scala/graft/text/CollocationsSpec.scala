package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("PMI: a fused pair scores above independently-mixed tokens") {
    // "new york" always adjacent; "a"/"b" co-occur at chance
    val docs = Seq(
      (1L, "new york a b a b new york b a"),
      (2L, "a new york b a b a b"),
      (3L, "b a new york a b")
    ).toDF("doc_id", "text")
    val out = Collocations.pmiCollocations(docs, minCount = 2, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    val top = out.head
    assert((top._1, top._2) == ("new", "york"))
    // hand check: c(new york)=4, Nb=21, c(new)=c(york)=4, Nt=24
    val expect = BigDecimal(math.log((4.0 / 21) / ((4.0 / 24) * (4.0 / 24))))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top._3 == 4L && top._4 == expect)
    // chance-level pairs score near zero, well below the collocation
    assert(out.filter(r => Set(r._1, r._2) == Set("a", "b")).forall(_._4 < 1.0))
  }
}
