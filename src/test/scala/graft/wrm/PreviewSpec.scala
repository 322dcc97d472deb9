package graft.wrm

import graft.SparkSpec

class PreviewSpec extends SparkSpec {
  import spark.implicits._

  test("markdown preview: pipe table with index, alignment row, n-row head") {
    val df = Seq(
      ("alpha", 1L, 1.5),
      ("b", 22L, -0.25),
      ("carol", 333L, 10.0),
      ("d", 4L, 0.0),
      ("e", 5L, 1.0),
      ("SIXTH-ROW-MUST-NOT-APPEAR", 6L, 6.0))
      .toDF("name", "n", "score")
    val md = Preview.toMarkdown(df, n = 5)
    val lines = md.split("\n")
    assert(lines.length == 7, md) // header + separator + 5 rows
    // header carries an index column plus the schema columns
    assert(lines(0).matches("""\|\s+\| name\s+\| {1,}n \| score\s+\|"""), lines(0))
    // separator: numeric columns (index, n, score) right-aligned, string left
    assert(lines(1).startsWith("|---") || lines(1).startsWith("|--"), lines(1))
    assert(lines(1).split("\\|")(2).startsWith(":"), s"name not left-aligned: ${lines(1)}")
    assert(lines(1).split("\\|")(3).endsWith(":"), s"n not right-aligned: ${lines(1)}")
    // head(5): the sixth row is cut
    assert(!md.contains("SIXTH-ROW-MUST-NOT-APPEAR"), md)
    assert(lines(2).contains("alpha") && lines(2).trim.startsWith("|"), lines(2))
    // every line has the same number of pipes — a well-formed table
    assert(lines.map(_.count(_ == '|')).distinct.length == 1, md)
  }

  test("markdown preview: nulls render empty, works on the wrm enhanced table") {
    val df = Seq((Some("x"), Option.empty[String]), (None, Some("y")))
      .toDF("a", "b")
    val md = Preview.toMarkdown(df, n = 2)
    assert(md.split("\n").length == 4)
    assert(!md.contains("null"), md)
    // the reference previews validated station frames; smoke the real table
    val wrmMd = Preview.toMarkdown(graft.wrm.WrmQueries.enhancedAll(spark), n = 5)
    assert(wrmMd.split("\n").length == 7)
    assert(wrmMd.split("\n").drop(2).forall(_.startsWith("| ")), wrmMd)
  }

  test("markdown preview: timestamps and collections render pandas-style") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), Seq(1, 2, 3)),
      (java.sql.Timestamp.valueOf("2024-01-02 03:04:05.25"), Seq.empty[Int]))
      .toDF("ts", "xs")
    val md = Preview.toMarkdown(df, n = 2)
    assert(md.contains("2024-01-02 03:04:05 "), md)   // whole-second: no .0
    assert(md.contains("2024-01-02 03:04:05.25"), md) // fraction kept
    assert(md.contains("[1, 2, 3]") && md.contains("[]"), md)
    assert(!md.contains("WrappedArray") && !md.contains("ArraySeq"), md)
  }
}
