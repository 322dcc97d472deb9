package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the Jaro-Winkler kernel to the DuckDB/rapidfuzz semantics the
  * oracle uses (values below were read off `jaro_winkler_similarity` in
  * DuckDB v1.0.0), plus a scalacheck differential against an
  * independently-written quadratic reference implementation.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values match DuckDB jaro_winkler_similarity") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    // jaro exactly 0.7333… > 0.7 but zero common prefix: boost is a no-op
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
  }

  test("edge semantics: empty beats equality; no matches is 0") {
    assert(jw("", "") === 0.0)   // DuckDB: length check precedes equality
    assert(jw("", "x") === 0.0)
    assert(jw("x", "") === 0.0)
    assert(jw("aaa", "aaa") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window max(2,2)/2-1 = 0: no matches
  }

  // Independent reference: straightforward transliteration of the textbook
  // definition, structured differently from the kernel (collects matched
  // char sequences instead of walking flag arrays).
  private def refJaro(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val md = math.max(a.length, b.length) / 2 - 1
    val usedB = collection.mutable.Set[Int]()
    val matchesA = collection.mutable.ArrayBuffer[Char]()
    val matchedBIdx = collection.mutable.ArrayBuffer[Int]()
    for (i <- a.indices) {
      val cands = (math.max(0, i - md) until math.min(b.length, i + md + 1))
        .filter(j => !usedB(j) && b(j) == a(i))
      cands.headOption.foreach { j =>
        usedB += j; matchesA += a(i); matchedBIdx += j
      }
    }
    val m = matchesA.size
    if (m == 0) return 0.0
    val matchesB = matchedBIdx.sorted.map(b(_))
    val t = matchesA.zip(matchesB).count { case (x, y) => x != y } / 2
    (m.toDouble / a.length + m.toDouble / b.length + (m - t).toDouble / m) / 3.0
  }

  private def refJw(a: String, b: String): Double = {
    val j = refJaro(a, b)
    if (j <= 0.7) j
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j + l * 0.1 * (1.0 - j)
    }
  }

  test("differential: kernel equals the independent reference on random strings") {
    val gen = Gen.chooseNum(0, 10).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
    (1 to 500).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = gen.apply(Gen.Parameters.default, Seed(i.toLong + 100000)).get
      assert(jw(a, b) === refJw(a, b), s"mismatch on ($a, $b)")
    }
  }

  test("expression evaluates under codegen in a DataFrame and via SQL registration") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"), ("", ""))
      .toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq ===
      Seq(0.9611111111111111, 0.8133333333333332, 0.0))
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(viaSql === 0.9611111111111111)
  }

  test("null propagates; non-string input is rejected at analysis") {
    import spark.implicits._
    val row = Seq((Option.empty[String], "x")).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .head()
    assert(row.isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, "x")).toDF("a", "b")
        .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}
