package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming duals of the batch degenerate-input sweeps (round 13): the
  * degenerate axes a long-running ingest hits that batch fixtures cannot
  * express —
  *
  *  1. an EMPTY source (zero-row parquet): every registry stream runner
  *     must produce its empty result, not crash in schema inference, state
  *     init, or the final reduce of the update log;
  *  2. ALL-LATE data beyond the watermark: a file of rows hours older than
  *     the watermark must be dropped deterministically by event-time
  *     semantics (never partially aggregated), while the on-time prefix is
  *     unaffected;
  *  3. a checkpoint RESTART mid-corpus: kill the query between
  *     micro-batches and resume from the checkpoint — the final output
  *     must equal the batch answer exactly (no duplicates from re-played
  *     batches, no drops from lost state; cross-batch join matches must
  *     come out of the RESTORED state store).
  *
  * The no-data micro-batch (the fourth degenerate axis) is exercised
  * implicitly: the all-late run ends with watermark-advance batches that
  * carry zero rows.
  */
class StreamDegenerateSpec extends SparkSpec {
  import spark.implicits._

  private def writeSingleFile(df: DataFrame, dir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("sds_one")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) {
        Files.move(p, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
        moved = true
      }
    }
    assert(moved, s"no part file written for $name")
  }

  // ---- 1. empty source ------------------------------------------------

  /** A degenerate sfDir whose events/documents tables have the real schema
    * and ZERO rows (directory layout, like ScaleUp output).
    */
  private lazy val emptySfDir: String = {
    val root = Files.createTempDirectory("sds_empty_sf")
    Tables.events(spark, "/root/testdata/sf0.001").limit(0)
      .write.parquet(root.resolve("events.parquet").toString)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(0)
      .write.parquet(root.resolve("documents.parquet").toString)
    root.toString
  }

  test("every registry stream runner survives an empty source") {
    val streamQs = graft.SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted
    assert(streamQs.size == 9, s"expected 9 stream rows, got $streamQs")
    streamQs.foreach { name =>
      val out = graft.SparkEntry.queries(name)(spark, emptySfDir).collect()
      assert(out.isEmpty, s"$name emitted ${out.length} rows from an empty source")
    }
  }

  // ---- 2. all-late data beyond the watermark --------------------------

  test("rows arriving entirely beyond the watermark are dropped, on-time prefix unaffected") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").cache()
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val onTimeOld = ev.filter(col("ts") >= lit(maxTs) - expr("INTERVAL 4 HOURS") &&
      col("ts") < lit(maxTs) - expr("INTERVAL 1 HOURS"))
    val onTimeNew = ev.filter(col("ts") >= lit(maxTs) - expr("INTERVAL 1 HOURS"))
    val onTime = ev.filter(col("ts") >= lit(maxTs) - expr("INTERVAL 4 HOURS"))
    val late = ev.filter(col("ts") < lit(maxTs) - expr("INTERVAL 8 HOURS"))
      .filter(col("ts") >= lit(maxTs) - expr("INTERVAL 16 HOURS"))
    assert(onTimeOld.count() > 0 && onTimeNew.count() > 0 && late.count() > 0,
      "fixture regions must be non-empty")

    val dir = Files.createTempDirectory("sds_late")
    // Spark keeps TWO watermark values per stateful operator: rows are
    // dropped as LATE against the PREVIOUS micro-batch's watermark (the
    // lenient one a sender could have observed), while state EVICTION
    // uses the current batch's. So the late file must arrive in batch 2:
    // batch 0 (the 4h..1h-old rows) raises the stats, batch 1 (the
    // newest hour — still-open windows only, so no already-evicted
    // window is reopened) carries the raised watermark into the
    // late-filter slot, and batch 2's 8h-old rows land below BOTH
    // watermarks and must be dropped entirely. File order is mtime.
    writeSingleFile(onTimeOld, dir, "a_ontime_old.parquet")
    writeSingleFile(onTimeNew, dir, "b_ontime_new.parquet")
    writeSingleFile(late, dir, "c_late.parquet")
    dir.resolve("a_ontime_old.parquet").toFile.setLastModified(1000000000000L)
    dir.resolve("b_ontime_new.parquet").toFile.setLastModified(1000000100000L)
    dir.resolve("c_late.parquet").toFile.setLastModified(1000000200000L)

    val name = s"sds_late_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val streamed = Tables.normalizeTs(spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString))
    val q = EventsStream.hourlyAgg(streamed) // append mode: watermark gates emission
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    q.processAllAvailable(); q.stop()

    val emitted = spark.table(name)
      .select(col("hour_start"), col("n"), col("total_value"))
      .as[(java.sql.Timestamp, Long, Double)].collect()
      .map { case (k, n, v) => k -> (n, v) }.toMap
    // every hour the late file populates must be ABSENT from the output
    val lateHours = late.select(date_trunc("hour", col("ts")).as("h"))
      .distinct().as[java.sql.Timestamp].collect().toSet
    val leaked = emitted.keySet.intersect(lateHours)
    assert(leaked.isEmpty, s"late windows leaked into the result: $leaked")
    // and every emitted window must carry the on-time-only aggregate
    val expect = onTime
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .as[(java.sql.Timestamp, Long, Double)].collect()
      .map { case (k, n, v) => k -> (n, v) }.toMap
    assert(emitted.nonEmpty, "watermark should have closed at least one on-time window")
    emitted.foreach { case (k, v) =>
      assert(expect.get(k).contains(v), s"window $k: got $v expected ${expect.get(k)}")
    }
    ev.unpersist()
  }

  // ---- 3. checkpoint restart mid-corpus --------------------------------

  test("kill + resume from checkpoint neither duplicates nor drops (stream-stream join state restores)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").cache()
    // eight files in EVENT-TIME order (ntile over ts): arrival order ==
    // event-time order, so nothing is watermark-late, and join matches
    // that span a file boundary can only come from restored state
    val dir = Files.createTempDirectory("sds_restart")
    val tiled = ev.withColumn("__t",
      ntile(8).over(org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (1 to 8).foreach { i =>
      writeSingleFile(tiled.filter(col("__t") === i).drop("__t"), dir, f"part_$i%02d.parquet")
      dir.resolve(f"part_$i%02d.parquet").toFile.setLastModified(1000000000000L + i * 60000L)
    }

    val outDir = Files.createTempDirectory("sds_restart_out").toString
    val ckpt = Files.createTempDirectory("sds_restart_ckpt").toString
    def startRun() = {
      val streamed = Tables.normalizeTs(spark.readStream
        .schema(spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString))
      EventsStream.purchaseViewJoin(streamed)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    // run 1: kill after at least one committed micro-batch, mid-corpus
    val run1 = startRun()
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (Option(run1.lastProgress).forall(_.batchId < 1) &&
           run1.isActive && System.nanoTime() < deadline) Thread.sleep(25)
    run1.stop(); run1.awaitTermination()
    // run 2: resume from the same checkpoint to completion
    val run2 = startRun()
    run2.awaitTermination()

    val got = spark.read.parquet(outDir)
      .select(col("purchase_id"), col("view_id"))
      .as[(Long, Long)].collect()
    val expected = EventsStream.purchaseViewJoin(ev)
      .select(col("purchase_id"), col("view_id"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    assert(got.length == got.toSet.size,
      s"restart duplicated ${got.length - got.toSet.size} join matches")
    assert(got.toSet == expected,
      s"restart dropped ${(expected -- got.toSet).size} / added ${(got.toSet -- expected).size} matches")
    ev.unpersist()
  }
}
