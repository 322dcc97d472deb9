package graft.sources

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary CSV sources (SURVEY §2.1 S12-S14): the reference's failures
  * feed — a folder of headered CSVs on object storage — plus the
  * "load most recent file" helper its IO manager exposes.
  *
  * Spark-first: one `spark.read.csv` over the folder glob (no per-file
  * driver loop — the reference reads file-by-file, storage/wrm_data/
  * failures/read.py:47-88); schema inference stays off in favor of
  * explicit DDL when known, falling back to header-based strings.
  */
object CsvFolderSource {

  /** Read every *.csv under a prefix as one frame with source lineage. */
  def readFolder(spark: SparkSession, prefix: String,
                 schemaDDL: Option[String] = None): DataFrame = {
    val reader = spark.read.option("header", "true")
    val withSchema = schemaDDL.map(reader.schema).getOrElse(
      reader.option("inferSchema", "false"))
    withSchema.csv(s"$prefix/*.csv")
      .withColumn("_source_file", input_file_name())
  }

  /** S14 "load most recent": pick rows of the newest file by mtime —
    * max_by over the file listing, no driver-side sort of data.
    */
  def mostRecentFile(spark: SparkSession, prefix: String): Option[String] = {
    val hPath = new org.apache.hadoop.fs.Path(s"$prefix/*.csv")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(hPath)).getOrElse(Array.empty)
    if (files.isEmpty) None
    else Some(files.maxBy(_.getModificationTime).getPath.toString)
  }

  /** Deterministic failures-style fixture (FIXTURES.md §5: any small
    * headered CSV under a failures/ prefix).
    */
  def writeFailuresFixture(): String = {
    val dir = java.nio.file.Paths.get(s"${graft.wrm.WrmScale.root}/failures")
    java.nio.file.Files.createDirectories(dir)
    // scale-aware (SPARK_GRAFT_WRM_SCALE): R× the report rows over an
    // R×-wider station key space — same growth shape as the raw fixture
    val rows = (1 to 40 * graft.wrm.WrmScale.scale).map { i =>
      val station = 1 + (i % (8 * graft.wrm.WrmScale.rowFactor))
      val kind = Seq("brake", "tire", "chain", "lock")(i % 4)
      f"2025-05-${1 + i % 2}%02d,$station%d,$kind%s,${i % 3}%d"
    }
    val csv = ("report_date,station_id,failure_type,severity" +: rows).mkString("\n")
    // idempotent write (see WrmFixture.writeRawFiles): never truncate a
    // file a concurrent reader may be listing
    def writeIfChanged(name: String, content: String): Unit = {
      val f = dir.resolve(name)
      val bytes = content.getBytes("UTF-8")
      if (!java.nio.file.Files.exists(f) ||
          !java.util.Arrays.equals(java.nio.file.Files.readAllBytes(f), bytes))
        java.nio.file.Files.write(f, bytes)
    }
    writeIfChanged("WRM_usterki_part1.csv", csv)
    writeIfChanged("WRM_usterki_part2.csv", csv.replace(",1,", ",9,"))
    dir.toString
  }

  /** Failures-by-type rollup over the CSV folder. Oracle reads the same
    * fixture CSVs with DuckDB's read_csv (sum(INTEGER) is HUGEINT there,
    * hence the BIGINT cast to match Spark's sum(int)→long).
    */
  val qFailures = GraftQuery(
    "wrm_failures_csv",
    (s, _) => {
      val prefix = writeFailuresFixture()
      readFolder(s, prefix,
        Some("report_date STRING, station_id INT, failure_type STRING, severity INT"))
        .groupBy(col("failure_type"))
        .agg(count(lit(1)).as("n"), sum(col("severity")).as("total_severity"),
          countDistinct(col("station_id")).as("n_stations"))
        .orderBy(col("failure_type"))
    },
    Some(s"""
      SELECT failure_type,
             count(*) AS n,
             CAST(sum(severity) AS BIGINT) AS total_severity,
             count(DISTINCT station_id) AS n_stations
      FROM read_csv('${graft.wrm.WrmScale.root}/failures/*.csv', header=true,
             columns={'report_date': 'VARCHAR', 'station_id': 'INTEGER',
                      'failure_type': 'VARCHAR', 'severity': 'INTEGER'})
      GROUP BY failure_type
      ORDER BY failure_type"""))

  val queries: Seq[GraftQuery] = Seq(qFailures)
}
