package graft.tools

import org.apache.spark.sql.functions._

/** One-off triage main: diff stream_session_window against batch q45 at a
  * given scale dir and print the divergent rows + the raw events of the
  * affected users. (Kept in-tree: the pattern recurs for any
  * streaming-vs-batch dual.)
  */
object DiffSession {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf10")
    val spark = graft.GraftSession.get()
    val batch = graft.relational.SessionQueries.q45.run(spark, dir)
    val stream = graft.streaming.EventsStream.runSessionWindowStream(spark, dir)
    batch.createOrReplaceTempView("b")
    stream.createOrReplaceTempView("s")
    val missing = spark.sql(
      "SELECT * FROM b EXCEPT ALL SELECT * FROM s").cache()
    val extra = spark.sql(
      "SELECT * FROM s EXCEPT ALL SELECT * FROM b").cache()
    println(s"batch=${batch.count()} stream=${stream.count()}")
    println(s"missing-from-stream=${missing.count()} extra-in-stream=${extra.count()}")
    missing.orderBy("user_id", "session_start").show(50, truncate = false)
    extra.orderBy("user_id", "session_start").show(50, truncate = false)
    val users = missing.select("user_id").union(extra.select("user_id"))
      .distinct().collect().map(_.getLong(0))
    if (users.nonEmpty) {
      graft.Tables.events(spark, dir)
        .filter(col("user_id").isin(users.take(3): _*))
        .orderBy("user_id", "ts", "event_id")
        .show(200, truncate = false)
    }
    spark.stop()
  }
}
