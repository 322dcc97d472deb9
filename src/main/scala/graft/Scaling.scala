package graft
import org.apache.spark.sql.functions._
object Scaling {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master="local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    def docsAt(mult: Int) = {
      val d = (0 until mult).map(i =>
        Tables.documents(spark, "/root/testdata/sf0.1")
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
      d.cache().count()
      d
    }
    // replicate documents/events N× to approximate larger SFs
    for (mult <- Seq(1, 4, 16)) {
      val docs = docsAt(mult)
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

    // Hierarchical prefix sum (q66 shape) vs the naive flat global window,
    // on the same chunk stream (window 8 / stride 2 ≈ 30 chunks per doc).
    // The flat form drags every row into ONE task; the hierarchical form
    // bounds tasks at groupSize docs — the gap is the parallelism the flat
    // plan forfeits, and it widens linearly with corpus size (measured:
    // parity at mult=16 / ~2.4M chunks, 2.6× at mult=64 / ~9.6M; at
    // cluster scale the flat plan is simply infeasible — one task must
    // hold and sort the corpus).
    for (mult <- Seq(16, 64)) {
      import org.apache.spark.sql.expressions.Window
      val docs = docsAt(mult)
      val chunks = text.CorpusPrep
        .chunkDocuments(docs, window = 8, stride = 2)
        .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"))
      chunks.cache().count()
      val budget = 256
      val tFlat = time {
        val w = Window.orderBy(col("doc_id"), col("chunk_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        chunks
          .withColumn("start_offset",
            coalesce(sum(col("chunk_tokens")).over(w), lit(0L)))
          .withColumn("batch_id", floor(col("start_offset") / budget).cast("long"))
          .write.format("noop").mode("overwrite").save()
      }
      val tHier = time {
        text.CorpusPrep.packChunks(chunks, budget, groupSize = 1000,
            ordered = false)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"mult=$mult%2d packing: flatWindow=$tFlat%6.2f hierarchical=$tHier%6.2f")
      chunks.unpersist()
      docs.unpersist()
    }
    spark.stop()
  }
}
