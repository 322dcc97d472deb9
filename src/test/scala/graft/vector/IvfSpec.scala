package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF: every vector lands in exactly one of nlist cells") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = IvfIndex.build(e, nlist = 8, iters = 1)
    assert(idx.lists.count() == e.count())
    val cells = idx.lists.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(idx.centroids.count() == 8)
  }

  test("IVF search: query's own vector is found; recall vs brute force is sane") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val idx = IvfIndex.build(e, nlist = 8, iters = 2)
    val got = IvfIndex.search(idx, q, k = 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(got.contains(0L)) // own cell always probed (highest centroid sim)
    val exact = Similarity.cosineTopK(e, q, 10).select("vec_id").as[Long].collect().toSet
    // probing half the cells should recover a good chunk of the true top-10
    assert((got intersect exact).size >= 3,
      s"recall too low: ${(got intersect exact).size}/10")
  }

  test("CSV folder source reads all files with lineage; most-recent helper works") {
    val prefix = graft.sources.CsvFolderSource.writeFailuresFixture()
    val df = graft.sources.CsvFolderSource.readFolder(spark, prefix,
      Some("report_date STRING, station_id INT, failure_type STRING, severity INT"))
    assert(df.count() == 80) // 2 files × 40 rows
    assert(df.select("_source_file").distinct().count() == 2)
    assert(graft.sources.CsvFolderSource.mostRecentFile(spark, prefix).isDefined)
    val agg = graft.sources.CsvFolderSource.qFailures.run(spark, "")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    // 4 failure kinds × 10 occurrences × 2 files
    assert(agg == Map("brake" -> 20L, "tire" -> 20L, "chain" -> 20L, "lock" -> 20L))
  }
}
