package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Triage main: diff any two registry queries' result sets at a given
  * scale dir — the recurring need behind every streaming-vs-batch dual
  * (stream_session_window vs q45, stream_hourly_window vs q17, …) and
  * behind any refactor that must preserve a query's rows bit-for-bit.
  *
  *   scripts/run.sh graft.tools.DiffSession <sfDir> <queryA> <queryB>
  *
  * Prints both cardinalities, the EXCEPT ALL divergence in each
  * direction, and a sample of divergent rows ordered by the common
  * column prefix. Generic by name over [[graft.SparkEntry.queries]] —
  * the round-15 one-off hardcoded the q45/stream pair
  * (VERDICT r15 item 7).
  */
object DiffSession {

  /** Both-direction EXCEPT ALL diff; returns (missingFromB, extraInB)
    * counts. Fails loud on an unknown name or on mismatched schemas
    * (printing both) — a schema drift IS a divergence, just one that
    * EXCEPT ALL cannot count.
    */
  def diff(spark: SparkSession, dir: String, nameA: String, nameB: String,
           show: Int = 0): (Long, Long) = {
    val qs = graft.SparkEntry.queries
    def run(n: String): DataFrame = qs.getOrElse(n,
      sys.error(s"unknown query '$n'; known: ${qs.keys.toSeq.sorted.mkString(", ")}")
    )(spark, dir)
    val a = run(nameA)
    val b = run(nameB)
    val (sa, sb) = (a.schema.fields.toSeq.map(f => (f.name, f.dataType)),
      b.schema.fields.toSeq.map(f => (f.name, f.dataType)))
    if (sa != sb)
      sys.error(s"schema mismatch:\n  $nameA: ${a.schema.simpleString}\n  $nameB: ${b.schema.simpleString}")
    a.createOrReplaceTempView("graft_diff_a")
    b.createOrReplaceTempView("graft_diff_b")
    val missing = spark.sql(
      "SELECT * FROM graft_diff_a EXCEPT ALL SELECT * FROM graft_diff_b").cache()
    val extra = spark.sql(
      "SELECT * FROM graft_diff_b EXCEPT ALL SELECT * FROM graft_diff_a").cache()
    val (nm, ne) = (missing.count(), extra.count())
    println(s"[diff] $nameA=${a.count()} rows, $nameB=${b.count()} rows")
    println(s"[diff] missing-from-$nameB=$nm extra-in-$nameB=$ne")
    if (show > 0 && (nm > 0 || ne > 0)) {
      val order = a.columns.toSeq
      println(s"[diff] rows only in $nameA:")
      missing.orderBy(order.head, order.tail: _*).show(show, truncate = false)
      println(s"[diff] rows only in $nameB:")
      extra.orderBy(order.head, order.tail: _*).show(show, truncate = false)
    }
    missing.unpersist(); extra.unpersist()
    (nm, ne)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: DiffSession <sfDir> <queryA> <queryB> [showRows=50]")
    val spark = graft.GraftSession.get()
    val (nm, ne) = diff(spark, args(0), args(1), args(2),
      show = args.lift(3).map(_.toInt).getOrElse(50))
    spark.stop()
    if (nm + ne > 0) sys.exit(1) // scriptable: nonzero on divergence
  }
}
