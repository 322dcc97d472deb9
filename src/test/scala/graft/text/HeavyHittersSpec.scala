package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[String]) = rows.toDF("text")
    .withColumn("doc_id", monotonically_increasing_id())

  test("heavy hitters: exact counts, only above-threshold tokens survive") {
    // 100 'a', 50 'b', 10 each of c0..c9 -> n = 250; k = 5 -> threshold
    // n/6 = 41.67: exactly {a: 100, b: 50} qualify. Distinct tokens (12)
    // exceed capacity (5), so the sketch MUST evict — the guarantee, not
    // buffer headroom, is what keeps a and b in the candidate set.
    val rows = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (0 until 10).flatMap(i => Seq.fill(10)(s"c$i"))
    val out = HeavyHitters.heavyHitters(docsOf(rows), k = 5)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 100L), ("b", 50L)))
  }

  test("heavy hitters: result is partitioning-independent") {
    val rows = new scala.util.Random(42).shuffle(
      Seq.fill(60)("x") ++ Seq.fill(30)("y") ++ (0 until 40).map(i => s"z$i"))
    val one = HeavyHitters.heavyHitters(docsOf(rows).coalesce(1), k = 4)
      .as[(String, Long)].collect().toSeq
    val many = HeavyHitters.heavyHitters(docsOf(rows).repartition(13), k = 4)
      .as[(String, Long)].collect().toSeq
    assert(one == many)
    assert(one.map(_._1).contains("x")) // 60 > 130/5
  }

  test("misra-gries summary never misses an above-threshold token (merge path)") {
    // Drive the aggregate directly across many partitions so partial
    // buffers are produced, serialized, and merged with the subtraction
    // rule; the n/(k+1) guarantee must hold for every merge order.
    val rows = Seq.fill(500)("hot") ++ (0 until 450).map(i => s"cold$i")
    val df = docsOf(new scala.util.Random(7).shuffle(rows)).repartition(17)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val cand = df.agg(HeavyHitters.misraGries(col("toks"), 8).as("cand"))
      .as[Seq[String]].head()
    // n = 950, k = 8 -> any token with count > 105.6 must be present
    assert(cand.contains("hot"))
    assert(cand.size <= 8)
  }

  test("misra-gries capacity validation fails fast") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.MisraGriesAgg(null, k = 0)
    }
    assert(e.getMessage.contains("graft_misra_gries"))
  }
}
