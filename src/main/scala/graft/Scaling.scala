package graft
import org.apache.spark.sql.functions._
object Scaling {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    // replicate documents/events N× to approximate larger SFs
    for (mult <- Seq(1, 4, 16)) {
      val docs = (0 until mult).map(i =>
        Tables.documents(spark, "/root/testdata/sf0.1")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
      docs.cache().count()
      val tMinhash = time {
        text.TextDedup.minhashDupPairs(docs, threshold = 0.9).write.format("noop").mode("overwrite").save()
      }
      val tCanonical = time {
        text.TextDedup.minhashCanonical(docs, threshold = 0.9).write.format("noop").mode("overwrite").save()
      }
      val tSimhash = time {
        docs.select(text.TextExprs.simhash64(spark, text.TextAnalysis.tokens(col("text")))).write.format("noop").mode("overwrite").save()
      }
      val ev = (0 until mult).map(i =>
        Tables.events(spark, "/root/testdata/sf0.1")
          .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)
      val tAgg = time {
        ev.groupBy(col("event_type"), date_trunc("day", col("ts"))).agg(count(lit(1)), sum(col("value").cast("decimal(18,2)"))).write.format("noop").mode("overwrite").save()
      }
      println(f"mult=$mult%2d docs=${5000*mult}%7d minhashPairs=$tMinhash%6.2f minhashCanonical=$tCanonical%6.2f simhash=$tSimhash%6.2f eventsAgg=$tAgg%6.2f")
      docs.unpersist()
    }
    spark.stop()
  }
}
