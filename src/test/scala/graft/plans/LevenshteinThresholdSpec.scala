package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Levenshtein

class LevenshteinThresholdSpec extends SparkSpec {
  import spark.implicits._

  // through parquet: a LocalRelation fixture would be folded away by
  // ConvertToLocalRelation before the rule ever sees the predicate
  private lazy val pairs = {
    val dir = java.nio.file.Files
      .createTempDirectory("lev_rule").resolve("pairs").toString
    Seq(
      ("kitten", "kitten"),  // 0
      ("kitten", "sitten"),  // 1
      ("kitten", "sittin"),  // 2
      ("kitten", "sitting"), // 3
      ("abcdef", "zyxwvu"))  // 6
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def thresholded(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
    }.flatten

  test("<= k rewrites to the banded form and keeps exact semantics") {
    val q = pairs.filter("levenshtein(a, b) <= 2")
    assert(thresholded(q).nonEmpty, "rule did not fire")
    assert(q.select("b").as[String].collect().toSet ==
      Set("kitten", "sitten", "sittin"))
  }

  test("the -1 sentinel cannot leak: over-threshold rows stay excluded") {
    // the naive-but-wrong rewrite lev(a,b,k) <= k would ADMIT dist>k
    // rows via -1 <= k; the >= 0 form must exclude them
    val q = pairs.filter("levenshtein(a, b) <= 0")
    assert(thresholded(q).nonEmpty)
    assert(q.count() == 1)
  }

  test("< and the flipped comparisons rewrite too") {
    val forms = Seq(
      "levenshtein(a, b) < 3" -> Set("kitten", "sitten", "sittin"),
      "2 >= levenshtein(a, b)" -> Set("kitten", "sitten", "sittin"),
      "2 > levenshtein(a, b)" -> Set("kitten", "sitten"))
    forms.foreach { case (pred, want) =>
      val q = pairs.filter(pred)
      assert(thresholded(q).nonEmpty, s"rule did not fire for: $pred")
      assert(q.select("b").as[String].collect().toSet == want, pred)
    }
  }

  test("negation context stays correct (pure expression equivalence)") {
    val q = pairs.filter("NOT (levenshtein(a, b) <= 2)")
    assert(q.select("b").as[String].collect().toSet ==
      Set("sitting", "zyxwvu"))
  }

  test("degenerate k < 0 is left alone (always-false folds away)") {
    assert(pairs.filter("levenshtein(a, b) <= -1").count() == 0)
  }
}
