package graft

import java.nio.file.Files

/** Registry-wide empty-input robustness: every query must return an
  * (empty) result — never throw — when every table has zero rows.
  *
  * Why this is a first-class property and not an edge case: at scale,
  * scheduled jobs routinely see inputs that prune to nothing (a partition
  * filter on a day with no data, a shard with no rows, a filter cascade
  * that removes everything). "Crash on empty" turns a normal morning into
  * a paged incident. The sweep that motivated this spec found four real
  * defects (q29/q38 query-row selection, q111's argmax over an empty
  * pool, q117's null SUM decode) — all crashes, none semantic.
  *
  * The fixture is a zero-row copy of every table (schema preserved via
  * limit(0) on the real sf0.001 parquet), so schema-dependent plumbing
  * (column resolution, encoders, casts) is still exercised.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_sf_empty").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    Tables.AllNames.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is empty-input safe") {
      // count() forces full execution; the assertion is "no throw" — the
      // row count itself is query-specific (most are 0; constant-output
      // shapes like corpus cards may legitimately emit summary rows)
      fn(spark, emptyDir).count()
    }
  }
}
