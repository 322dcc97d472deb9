package graft

/** Time individual registry queries end-to-end (noop write), min-of-N —
  * the single-query companion to [[Bench]] for iterating on one plan
  * without paying the full-registry run.
  *
  * Usage: scripts/run.sh graft.TimeOne <sfDir> <runs> <name> [<name> ...]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeOne <sfDir> <runs> <name>...")
    val (dir, runs, names) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
