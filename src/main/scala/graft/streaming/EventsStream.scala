package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream: watermarked windowed
  * aggregation (T6) and stateful latest-per-key (T7) — the streaming duals
  * of q18_hourly_window and q06_latest_per_key.
  */
object EventsStream {

  import graft.GraftQuery

  /** Streaming duals of q18/q06, run as real streaming queries and checked
    * against the SAME DuckDB oracles — the streaming path must compute the
    * batch answer.
    */
  val qStreamHourly = GraftQuery(
    "stream_hourly_window",
    (s, dir) => runHourlyWindowStream(s, dir),
    graft.relational.RelationalQueries.q18.oracle)

  val qStreamLatest = GraftQuery(
    "stream_latest_per_user",
    (s, dir) => runLatestPerUserStream(s, dir),
    graft.relational.RelationalQueries.q06.oracle)

  /** T-join: the stream-stream interval join, run as a real streaming
    * query and checked against the equivalent batch interval join in
    * DuckDB (inner joins emit every match regardless of watermark, so the
    * streaming result equals the batch join).
    */
  val qStreamJoin = GraftQuery(
    "stream_purchase_view_join",
    (s, dir) => runPurchaseViewJoinStream(s, dir),
    Some("""
      SELECT p.user_id, p.purchase_id, v.view_id, p.p_ts, v.v_ts,
             p.purchase_value
      FROM (SELECT user_id, event_id AS purchase_id,
                   CAST(ts AS TIMESTAMP) AS p_ts, value AS purchase_value
            FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT user_id AS v_user, event_id AS view_id,
                   CAST(ts AS TIMESTAMP) AS v_ts
            FROM events WHERE event_type = 'view') v
        ON p.user_id = v.v_user
       AND v.v_ts <= p.p_ts
       AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR
      ORDER BY purchase_id, view_id"""))

  /** Streaming session windows — the streaming dual of q45, checked
    * against the SAME oracle: session identity is event-time-derived, so
    * the final table is micro-batch-composition-independent.
    */
  val qStreamSessions = GraftQuery(
    "stream_session_window",
    (s, dir) => runSessionWindowStream(s, dir),
    graft.relational.SessionQueries.q45.oracle)

  /** Append-mode session windows (VERDICT r17 item 3): the bounded-state
    * production variant of stream_session_window. The watermark closes a
    * session once no event can extend it, the CLOSED session is emitted
    * exactly once, and its state is evicted — state holds only OPEN
    * sessions within the watermark horizon, so the soak's state curve is
    * flat instead of linear-in-sessions. Oracle: the batch q45 sessions
    * restricted to those the final watermark closes. Spark tracks the
    * watermark in MILLISECONDS (EventTimeStats stores maxEventTime/1000),
    * so the oracle floors max(ts) to the millisecond before subtracting
    * the delay; a session is emitted when its end has been REACHED by the
    * watermark (inclusive <=, pinned by the constructed-tie spec in
    * StreamingSpec: a session ending exactly AT the final watermark is
    * emitted closed).
    */
  val qStreamSessionsAppend = GraftQuery(
    "stream_session_window_append",
    (s, dir) => runSessionWindowAppendStream(s, dir),
    Some("""
      WITH sess AS (
        SELECT user_id,
               min(ts_us) AS session_start,
               max(ts_us) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM (
          SELECT user_id, value, ts_us,
                 sum(boundary) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
          FROM (
            SELECT user_id, event_id, value,
                   CAST(ts AS TIMESTAMP) AS ts_us,
                   CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                         OR epoch(CAST(ts AS TIMESTAMP))::BIGINT -
                            epoch(lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id))::BIGINT >= 1800
                        THEN 1 ELSE 0 END AS boundary
            FROM events) b) s
        GROUP BY user_id, session_no),
      wm AS (
        SELECT (epoch_us(max(CAST(ts AS TIMESTAMP))) // 1000) * 1000
               - 1800000000 AS wm_us
        FROM events)
      SELECT user_id, session_start, session_end, n_events, session_value
      FROM sess, wm
      WHERE epoch_us(session_end) <= wm.wm_us
      ORDER BY user_id, session_start"""))

  def queries: Seq[GraftQuery] =
    Seq(qStreamHourly, qStreamLatest, qStreamJoin, qStreamSessions,
      qStreamSessionsAppend)

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class LatestEvent(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  /** Hourly tumbling-window counts/sums with a 1-hour watermark for
    * bounded state. Append mode: a window emits once its watermark passes —
    * at 100 TB/day the state store holds only open windows.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("total_value"))

  /** Stage the events parquet into a directory (streaming file sources
    * require directories) and return a micro-batch stream of it with the
    * `ts` normalization applied (nanos-as-long or NTZ → LTZ micros, the
    * [[graft.Tables.normalizeTs]] rule). The staged copy + inferred schema
    * are memoized per source dir — the copy and footer read are setup, not
    * part of any streaming operator's work.
    */
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, (String, org.apache.spark.sql.types.StructType)]()

  /** Parquet payload bytes at `src` — a single file, or the part-file sum
    * when the source is a Spark-written directory (e.g. ScaleUp output).
    */
  private[streaming] def parquetSize(src: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(src)) {
      // Files.list holds a directory handle until closed
      val s = java.nio.file.Files.list(src)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally s.close()
    } else java.nio.file.Files.size(src)
  }

  /** Copy `src` into `destDir`: flat part-file copy for a directory
    * source, plain copy for a single file. Both testdata layouts (driver
    * single-file fixtures, Spark-written directories) must stage — a bare
    * Files.copy of a directory creates an EMPTY dir and every stream
    * query on that corpus dies at schema inference.
    */
  private[streaming] def stageParquet(src: java.nio.file.Path,
                                      destDir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(src)) {
      val s = java.nio.file.Files.list(src)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
        .foreach(p => java.nio.file.Files.copy(p, destDir.resolve(p.getFileName)))
      finally s.close()
    } else java.nio.file.Files.copy(src, destDir.resolve(src.getFileName))
  }

  def stagedEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (dir, schema) = staged.computeIfAbsent(sfDir, { _ =>
      val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
      val d = java.nio.file.Paths.get(
        shmTempDir("events_stream", parquetSize(src)))
      if (sys.env.contains("SPARK_GRAFT_STREAM_MAX_FILES"))
        stageTimeBucketed(spark, src, d)
      else stageParquet(src, d)
      (d.toString, spark.read.parquet(d.toString).schema)
    })
    graft.Tables.normalizeTs(
      withMaxFiles(spark.readStream.schema(schema))
        .parquet(dir))
  }

  /** Soak-mode staging: multi-batch file consumption must deliver
    * event-time-ordered micro-batches — the arrival order a production
    * file feed provides — or watermark semantics CORRECTLY drop later
    * batches' rows as late (the r17 soak caught exactly this:
    * stream_purchase_view_join lost ~80% of its matches when every
    * staged part file spanned the whole time range, so batch 1's
    * watermark aged out batches 2..10 — right per the watermark
    * contract, wrong as a delivery model). Range-partition the source by
    * raw event time into ascending buckets and pin strictly increasing
    * mtimes, so FileStreamSource's (mtime, path) order IS time order;
    * every windowed/stateful operator is insensitive to the re-layout.
    */
  private def stageTimeBucketed(spark: SparkSession, src: java.nio.file.Path,
                                destDir: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(src.toString)
      .repartitionByRange(100, col("ts"))
      .write.mode("overwrite").parquet(destDir.toString)
    val s = java.nio.file.Files.list(destDir)
    try {
      val files = {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
      }
      val base = System.currentTimeMillis() - files.size * 1000L
      files.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
      }
    } finally s.close()
  }

  /** Micro-batch slicing for soak runs (VERDICT r16 item 3): the file
    * source admits at most SPARK_GRAFT_STREAM_MAX_FILES files per
    * micro-batch, so setting 10 against the 100-part sf10 staging dirs
    * turns every one-shot AvailableNow gate into a ≥10-micro-batch soak
    * of the SAME query against the SAME batch oracle — the oracles are
    * composition-independent by design (dedup keeps a min, windows
    * re-aggregate, latest-per-key keeps a max), so the final table must
    * hash-match whatever the batch slicing. Unset = the historical
    * single-batch gate behavior.
    */
  private[streaming] def withMaxFiles(
      r: org.apache.spark.sql.streaming.DataStreamReader):
      org.apache.spark.sql.streaming.DataStreamReader =
    sys.env.get("SPARK_GRAFT_STREAM_MAX_FILES")
      .fold(r)(v => r.option("maxFilesPerTrigger", v))

  /** Per-batch state-store telemetry for the soak (VERDICT r16 item 3):
    * when SPARK_GRAFT_STREAM_METRICS names a file, every micro-batch
    * appends one JSON line — input rows, batch wall, and each stateful
    * operator's rows/memory/commit time — the evidence for the SCALE.md
    * state-growth table. Registered once per JVM; a no-op otherwise.
    */
  private val metricsRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)
  private[streaming] def registerMetricsListener(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_STREAM_METRICS").foreach { path =>
      if (metricsRegistered.compareAndSet(false, true)) {
        spark.streams.addListener(
          new org.apache.spark.sql.streaming.StreamingQueryListener {
            import org.apache.spark.sql.streaming.StreamingQueryListener._
            override def onQueryStarted(e: QueryStartedEvent): Unit = ()
            override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
            override def onQueryProgress(e: QueryProgressEvent): Unit = {
              val p = e.progress
              // query/operator names are free-form strings — escape them,
              // or a quote/backslash in a name emits a malformed JSONL
              // line that kills soak_table.py mid-parse
              def jstr(s: String): String = {
                val b = new StringBuilder
                s.foreach {
                  case '"'  => b.append("\\\"")
                  case '\\' => b.append("\\\\")
                  case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
                  case c => b.append(c)
                }
                b.toString
              }
              val states = p.stateOperators.map { s =>
                s"""{"operator":"${jstr(s.operatorName)}","numRowsTotal":${s.numRowsTotal},""" +
                  s""""numRowsUpdated":${s.numRowsUpdated},"numRowsRemoved":${s.numRowsRemoved},""" +
                  s""""memoryUsedBytes":${s.memoryUsedBytes},""" +
                  s""""commitTimeMs":${s.commitTimeMs}}"""
              }.mkString("[", ",", "]")
              val line = s"""{"query":"${jstr(Option(p.name).getOrElse(p.id.toString))}",""" +
                s""""batchId":${p.batchId},"numInputRows":${p.numInputRows},""" +
                s""""batchDurationMs":${p.batchDuration},"stateOperators":$states}""" + "\n"
              EventsStream.this.synchronized {
                java.nio.file.Files.write(java.nio.file.Paths.get(path),
                  line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                  java.nio.file.StandardOpenOption.CREATE,
                  java.nio.file.StandardOpenOption.APPEND)
              }
            }
          })
      }
    }

  /** Stateful-operator parallelism for these single-batch AvailableNow
    * runs: the shuffle-partition count at query start fixes the number of
    * state-store instances, and 32 instances of init/commit overhead
    * dominate a one-batch run whose whole state fits in a handful. On a
    * real cluster this is sized to state volume the same way — it only
    * changes layout, never results.
    */
  /** Overridable for tuning probes; 4 measured best on this harness
    * (state volume is tiny — instance init/commit overhead dominates).
    */
  private[streaming] def streamPartitions: Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTS") match {
      case None => 4
      case Some(v) => scala.util.Try(v.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_STREAM_PARTS must be an integer, got: '$v'"))
    }

  /** SIZE-AWARE stateful parallelism: the fixed 4-instance layout that
    * wins on fixture-scale state serializes at volume — the r16
    * StageProfile of stream_session_window at sf10 showed its stateful
    * stage as 4 tasks of ~28.5 s each (114 s of task time behind a
    * 4-way bottleneck, over half the row's wall). Scale the instance
    * count with the source's parquet bytes (~1 instance per 8 MB),
    * clamped to [streamPartitions, 32]: fixture runs keep the measured
    * 4-instance layout, volume runs spread state across the cores. The
    * same sizing rule a cluster job applies per state volume; explicit
    * SPARK_GRAFT_STREAM_PARTS still overrides. Layout only — session
    * identity is event-time-derived, so results are partition-count
    * independent (the sf10 streaming gate runs green at any setting).
    */
  private[streaming] def streamPartitionsFor(srcParquet: String): Int =
    if (sys.env.contains("SPARK_GRAFT_STREAM_PARTS")) streamPartitions
    else {
      val bytes = scala.util.Try(
        parquetSize(java.nio.file.Paths.get(srcParquet))).getOrElse(0L)
      math.min(32, math.max(streamPartitions, (bytes / (8L << 20)).toInt))
    }

  private[streaming] def withStreamPartitions[T](spark: SparkSession, n: Int = streamPartitions,
      noDataBatches: Boolean = false)(f: => T): T = {
    registerMetricsListener(spark) // no-op unless SPARK_GRAFT_STREAM_METRICS
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    // The watermark-advancing no-data batch costs a full state
    // load/evict/commit cycle (~0.7 s here) and emits nothing for most of
    // these sinks: hourly is COMPLETE mode (every batch emits all
    // windows), latest is UPDATE mode, and the join is INNER (matches
    // emit on arrival, never on watermark). APPEND-mode aggregations are
    // the exception — they emit ON watermark passage, so the final
    // watermark's no-data batch is what flushes the last closed windows
    // (without it the append session run emits NOTHING on a one-batch
    // AvailableNow source) — those runs pass noDataBatches=true.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      noDataBatches.toString)
    // SPARK_GRAFT_STATESTORE=rocksdb: run with the PRODUCTION state-store
    // stack — RocksDB provider + changelog checkpointing (per-batch delta
    // upload instead of full SST snapshot). Default stays the HDFS-backed
    // in-memory provider: for these one-batch AvailableNow gate runs the
    // whole state lives and dies in one JVM, where RocksDB's native
    // write path is pure overhead (A/B at sf10 in SCALE.md r16); on a
    // long-running cluster job state outgrows the heap and rocksdb is
    // the right default. Results are provider-independent either way —
    // CORRECTNESS_sf10 runs green under both.
    if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb")) {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(changelogKey, "true")
    }
    try f finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      prevProvider.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      prevChangelog.fold(spark.conf.unset(changelogKey))(spark.conf.set(changelogKey, _))
    }
  }

  /** Temp directory on tmpfs when available (checkpoints, staged sources): the offset WAL, commit
    * log, and every HDFS-backed state-store snapshot fsync under the
    * checkpoint root, and /tmp is disk-backed in this harness — memory
    * residency shaves the fixed cost a short AvailableNow run is dominated
    * by. Durability is a non-goal for these verification/bench runs (a
    * production deployment points this at reliable storage; the code path
    * is identical).
    */
  private val shmDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    // deleteOnExit can't remove non-empty directories — a shutdown hook
    // deletes the trees recursively, or checkpoint/state files would leak
    // permanently in RAM-backed /dev/shm across runs
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      shmDirs.forEach { d =>
        try {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          Files.walk(d).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () } })
        } catch { case _: Exception => () }
      }
    }))
  }

  /** `needBytes` is the caller's size estimate (staged file size, expected
    * checkpoint volume); tmpfs is only used when it has 2x that headroom,
    * so a large SF can never fill RAM-backed /dev/shm — it degrades to
    * java.io.tmpdir instead.
    */
  private[streaming] def shmTempDir(prefix: String, needBytes: Long = 64L << 20): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val usable = scala.util.Try(
      java.nio.file.Files.getFileStore(shm).getUsableSpace).getOrElse(0L)
    val d =
      if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm) && usable >= needBytes * 2)
        java.nio.file.Files.createTempDirectory(shm, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    shmDirs.add(d)
    d.toString
  }

  /** Run the hourly aggregation as a real streaming query (complete mode,
    * AvailableNow) and return the final result — oracle-identical to the
    * batch q18, proving the streaming path computes the same answer.
    */
  def runHourlyWindowStream(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, streamPartitionsFor(s"$sfDir/events.parquet")) {
    val name = s"stream_hourly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = stagedEventStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("total_value"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation", shmTempDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy(col("hour_start"))
  }

  /** Run 30-minute-gap session windows as a real streaming query
    * (complete mode: merging session state emits its final merged form
    * every batch, so the last table IS the batch q45 answer). At
    * production volume this runs append-mode with the watermark closing
    * sessions incrementally — same operator, bounded state; complete mode
    * here is what makes the one-shot run oracle-comparable.
    */
  def runSessionWindowStream(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, streamPartitionsFor(s"$sfDir/events.parquet")) {
      val name = s"stream_session_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = stagedEventStream(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("session_value"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .option("checkpointLocation", shmTempDir(name))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).orderBy(col("user_id"), col("session_start"))
    }

  /** Append-mode session windows with watermarked eviction — the
    * bounded-state production variant (VERDICT r17 item 3). The 30-minute
    * watermark delay matches the session gap: once the watermark passes a
    * session's end, no event inside the delay can extend it, the session
    * is emitted CLOSED (exactly once — append mode), and its state row is
    * evicted. In the soak's ascending time-bucketed delivery the
    * watermark advances every batch, so state holds only the open tail
    * (~gap+delay of event time) instead of every session ever seen. The
    * final emitted set is deterministic — sessions whose end precedes the
    * global max event time minus the delay — which is what makes a batch
    * oracle possible for an append-mode stateful stream.
    */
  def runSessionWindowAppendStream(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, streamPartitionsFor(s"$sfDir/events.parquet"),
        noDataBatches = true) {
      val name = s"stream_session_append_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = stagedEventStream(spark, sfDir)
        .withWatermark("ts", "30 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("session_value"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", shmTempDir(name))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).orderBy(col("user_id"), col("session_start"))
    }

  /** Run latest-per-user as a stateful streaming query (update mode) and
    * reduce the update log to final state — oracle-identical to batch q06.
    */
  def runLatestPerUserStream(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, streamPartitionsFor(s"$sfDir/events.parquet")) {
    import spark.implicits._
    val name = s"stream_latest_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // an event with a null id/user/time/value can't decode into the typed
    // state row — drop at the boundary (the ingest validation rule).
    // isNotNull per column, NOT na.drop: na.drop also treats NaN as
    // missing for double columns, and a NaN-VALUED event is a decodable,
    // legitimate record the batch dual (q06) keeps — the r14 extreme-
    // numerics sweep caught the streaming side silently dropping it and
    // electing an older event as a user's latest.
    val q = latestPerUser(stagedEventStream(spark, sfDir)
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull).as[Event])
      .writeStream.outputMode("update").format("memory").queryName(name)
      .option("checkpointLocation", shmTempDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("w"))
      .select(col("user_id"), col("w.event_id").as("event_id"),
        col("w.event_type").as("event_type"), col("w.value").as("value"),
        col("w.ts").as("ts_us"))
      .orderBy(col("user_id"))
    }

  /** Stream-stream interval join: purchases joined to the same user's
    * views within the preceding hour. Both sides watermarked so the join
    * state is bounded — Spark retains only rows inside the watermark +
    * interval window (the standard bounded-state stream join recipe).
    *
    * The equality key is (user, lookback-wide time bucket), not user
    * alone: the symmetric hash join probes EVERY state row of the key on
    * each input, so keying a month of events by a low-cardinality user id
    * makes probe work O(rows·rows_per_user) (measured: 5M+ interval
    * checks on this fixture) and concentrates state in few partitions.
    * Bucketing the key makes probes touch only the ≤2 buckets the
    * interval can span — purchases are exploded into (bucket, bucket−1),
    * views keep their single bucket, so every qualifying pair still
    * matches exactly once and the range predicate is unchanged. Probe
    * work drops to O(matches); state keys spread across time.
    */
  def purchaseViewJoin(events: DataFrame, lookback: String = "1 hour"): DataFrame = {
    // the watermark must cover the lookback interval, or the view-side
    // state is evicted before qualifying matches arrive — derive both
    // (and the bucket width) from the one parameter so they can't diverge.
    // Calendar intervals are rejected: "1 month"/"1 year" have variable
    // duration, so a width anchored at epoch could under-cover the real
    // span and the two-bucket explode would silently miss pairs.
    require(!lookback.toLowerCase.matches(".*(month|year).*"),
      s"purchaseViewJoin lookback must be a fixed-duration interval, got: $lookback")
    val widthUs = expr(s"unix_micros(timestamp'1970-01-01 00:00:00Z' + INTERVAL $lookback)")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"),
        explode(array(floor(unix_micros(col("ts")) / widthUs),
          floor(unix_micros(col("ts")) / widthUs) - 1)).as("p_bucket"))
      .withWatermark("p_ts", lookback)
    val views = events
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"),
        floor(unix_micros(col("ts")) / widthUs).as("v_bucket"))
      .withWatermark("v_ts", lookback)
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("p_bucket") === col("v_bucket") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"), col("purchase_value"))
  }

  /** Run the purchase↔view interval join as a real streaming query
    * (append mode — the only mode stream-stream joins support) and return
    * every emitted match, ordered for a stable dump.
    */
  def runPurchaseViewJoinStream(spark: SparkSession, sfDir: String): DataFrame =
    withStreamPartitions(spark, streamPartitionsFor(s"$sfDir/events.parquet")) {
    val name = s"stream_join_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = purchaseViewJoin(stagedEventStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", shmTempDir(name))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy(col("purchase_id"), col("view_id"))
    }

  /** T7: live latest-per-user via mapGroupsWithState — state is one record
    * per key (bounded by key cardinality, like the reference's
    * latest-per-station view).
    */
  def latestPerUser(events: Dataset[Event]): Dataset[LatestEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LatestEvent]) =>
          // order by FULL timestamp precision: getTime alone is ms-truncated,
          // and two events in the same millisecond but different microseconds
          // would keep the wrong record vs the µs-ordered batch dual (q06)
          val newest = (state.getOption.iterator ++ batch.map(e =>
            LatestEvent(e.user_id, e.event_id, e.ts, e.event_type, e.value)))
            .maxBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          state.update(newest)
          newest
      }
  }
}
