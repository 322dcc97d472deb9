package graft.wrm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteDate replaces only the affected date partitions (T4 late-data path)") {
    val root = java.nio.file.Files.createTempDirectory("sinks").toString
    val enhanced = WrmQueries.enhancedAll(spark) // dates 2025-05-01, 2025-05-02
    Sinks.appendEnhanced(enhanced, root)
    val before = spark.read.parquet(root)
    assert(before.count() == 72)

    // late-data recompute of 05-01 only: half the rows, recognizably new
    val recomputed = enhanced
      .filter(col("date") === lit("2025-05-01").cast("timestamp"))
      .filter(col("record_type") === "station")
    Sinks.overwriteDate(recomputed, root)

    val after = spark.read.parquet(root)
    // 05-01 fully replaced by the 24 station rows; 05-02 untouched (36)
    assert(after.filter(col("dt") === "2025-05-01").count() == 24)
    assert(after.filter(col("dt") === "2025-05-02").count() == 36)
    // idempotent: running the same overwrite again changes nothing
    Sinks.overwriteDate(recomputed, root)
    assert(spark.read.parquet(root).count() == 60)
  }

  test("GraftSession-built sessions have the extension SQL functions injected") {
    // no manual TextExprs.register — GraftExtensions did it at build time
    val row = spark.sql(
      "SELECT graft_simhash(array('a','b')) AS h, graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getDouble(1) == 1.0)
  }
}
