package graft.streaming

import graft.GraftSession

/** Tuning probe for the three real streaming runs: times each at several
  * state-partition counts (SPARK_GRAFT_STREAM_PARTS overrides the runs'
  * default) so the fixed micro-batch cost is measured, not guessed.
  * Usage: scripts/run.sh graft.streaming.StreamProbe [sfDir]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // warm the streaming machinery once, untimed, against the same sfDir
    // (a fixed warm-up path would crash on machines without that fixture)
    EventsStream.runHourlyWindowStream(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val runs: Seq[(String, () => Unit)] = Seq(
      "hourly" -> (() => EventsStream.runHourlyWindowStream(spark, sfDir)
        .write.format("noop").mode("overwrite").save()),
      "latest" -> (() => EventsStream.runLatestPerUserStream(spark, sfDir)
        .write.format("noop").mode("overwrite").save()),
      "join" -> (() => EventsStream.runPurchaseViewJoinStream(spark, sfDir)
        .write.format("noop").mode("overwrite").save()))
    runs.foreach { case (name, fn) =>
      val best = (1 to 2).map(_ => time(fn())).min
      println(f"$name%-8s parts=${EventsStream.streamPartitions}%-3d min=$best%6.2f s")
    }

    // detailed progress for the join run: where do the milliseconds go?
    if (sys.env.contains("SPARK_GRAFT_STREAM_DETAIL")) {
      spark.conf.set("spark.sql.shuffle.partitions", EventsStream.streamPartitions.toString)
      val q = EventsStream.purchaseViewJoin(EventsStream.stagedEventStream(spark, sfDir))
        .writeStream.outputMode("append").format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.foreach(p => println(p.json))
    }
    spark.stop()
  }
}
