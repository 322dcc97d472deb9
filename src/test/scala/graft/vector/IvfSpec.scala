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

  test("IVF with nprobe = nlist is EXACTLY brute force (pruning off ⇒ identity)") {
    // With every cell probed, the candidate set is the whole corpus and the
    // ranking must be bit-identical to cosineTopK — this pins the whole
    // assignment/probe/rank machinery as exact; the recall tests then only
    // measure the pruning trade-off, never hidden scoring bugs.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val idx = IvfIndex.build(e, nlist = 8, iters = 1)
    val ivf = IvfIndex.search(idx, q, k = 15, nprobe = 8)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    val exact = Similarity.cosineTopK(e, q, 15)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(ivf == exact, s"nprobe=nlist diverged from brute force:\n$ivf\n$exact")
  }

  test("k-means|| init spreads centers on an id-sorted clustered corpus") {
    // Adversarial for prefix seeding: 8 well-separated clusters laid out
    // so ids 0..49 are ALL in cluster 0 — first-nlist-by-id init would put
    // every centroid in one region and Lloyd can't fully recover.
    val dims = 16; val groups = 8; val perGroup = 50
    val rows = for (g <- 0 until groups; i <- 0 until perGroup) yield {
      val id = g * perGroup + i
      val emb = (0 until dims).map { d =>
        val base = if (d == g * 2) 1.0f else 0.0f
        base + 0.01f * ((id * 31 + d) % 7 - 3)
      }
      (id.toLong, emb)
    }
    val df = rows.toDF("vec_id", "embedding")
    val idx = IvfIndex.build(df, nlist = 8, iters = 2)
    // most planted clusters should own a real cell, not collapse into one
    val sizes = idx.lists.groupBy("cell").count().as[(Int, Long)].collect()
    assert(sizes.count(_._2 >= perGroup / 2) >= 6,
      s"centers collapsed: ${sizes.sortBy(_._1).mkString(",")}")
    // a query in the LAST group (farthest from the id prefix) has recall
    val q = df.filter(col("vec_id") === (groups * perGroup - 1))
      .select(col("embedding").as("qv"))
    val got = IvfIndex.search(idx, q, k = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.cosineTopK(df.withColumn("label", lit("")), q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert((got intersect exact).size >= 5,
      s"recall@10 too low on the far cluster: $got vs $exact")
  }

  test("persisted index: probe over the parquet round-trip equals in-memory search") {
    val dir = "/root/testdata/sf0.001"
    val out = IvfIndex.ensurePersisted(spark, dir, nlist = 16, iters = 2)
    // ready-marker written; a second call must reuse, not rebuild (the
    // marker's mtime is the witness)
    val marker = new java.io.File(out, "_GRAFT_INDEX_READY")
    assert(marker.exists())
    val mtime = marker.lastModified()
    IvfIndex.ensurePersisted(spark, dir, nlist = 16, iters = 2)
    assert(marker.lastModified() == mtime, "index rebuilt on warm call")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val persisted = IvfIndex.loadPersisted(spark, out)
    val got = IvfIndex.search(persisted, q, k = 20, nprobe = 16)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    val exact = Similarity.cosineTopK(e, q, 20)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(got == exact, "persisted probe diverged from brute force")
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
