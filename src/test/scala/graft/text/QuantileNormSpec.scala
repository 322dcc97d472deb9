package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("quantile normalize: hand-computed percent ranks with ties") {
    val rows = Seq(
      (1L, "a", 0.2), (2L, "a", 0.5), (3L, "a", 0.5), (4L, "a", 0.9),
      (5L, "b", 0.7),                     // singleton group -> 0.0
      (6L, "c", 0.1), (7L, "c", 0.4)
    ).toDF("doc_id", "grp", "score")
    val out = QuantileNorm.quantileNormalize(rows, "grp", "score")
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toMap
    // group a (n=4): ranks 1,2,2,4 -> (rank-1)/3
    assert(out(1L) == 0.0)
    assert(out(2L) == out(3L) && out(3L) == BigDecimal(1.0 / 3)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)
    assert(out(6L) == 0.0 && out(7L) == 1.0)
  }

  test("quantile normalize: matches Spark's own percent_rank window") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 5}", (i * 37 % 11).toDouble / 11))
      .toDF("doc_id", "grp", "score")
    val got = QuantileNorm.quantileNormalize(rows, "grp", "score")
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toMap
    val want = rows.withColumn("pr",
        round(percent_rank().over(Window.partitionBy("grp").orderBy("score")), 8))
      .select("doc_id", "pr").as[(Long, Double)].collect().toMap
    assert(got == want)
  }
}
