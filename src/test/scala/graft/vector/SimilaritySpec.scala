package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot / cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.cosine(col("a"), col("a")).as("self"),
        Similarity.cosine(col("a"), col("b")).as("c"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.9746318461970762) < 1e-12)
  }

  test("native CosineSim expression matches the HOF reference bit-for-bit") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val diffs = e.crossJoin(q)
      .select(
        Similarity.cosine(col("embedding"), col("qv")).as("hof"),
        VectorExprs.cosineSim(col("embedding"), col("qv")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diffs == 0)
  }

  test("zero vector cosine is 0, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(df.collect()(0).getDouble(0) == 0.0)
  }

  test("multi-probe multi-table LSH ANN: full k results and recall@10 >= 0.8") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = Similarity.cosineTopK(e, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.annLsh(e, q, 10, planes = 4)
      .select("vec_id").as[Long].collect().toSet
    // the query vector itself must always be found (same bucket), the
    // probe set must fill k, and 1-flip probes OR-amplified across three
    // independent tables must recover >= 80% of the true top-10
    assert(approx.contains(0L))
    assert(approx.size == 10, s"expected k=10 results, got ${approx.size}")
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall below 0.8: $approx vs $exact")

    // md5 hash mode: same contract (the oracle-checkable variant). The
    // table count is the recall knob — this hash family draws less lucky
    // hyperplanes on this fixture, and two more tables recover the bound
    // (recall ≈ 1-(1-p)^tables rises with tables at fixed cost/table).
    val md5Approx = Similarity.annLsh(e, q, 10, planes = 4, tables = 5,
        hashMode = "md5")
      .select("vec_id").as[Long].collect().toSet
    assert(md5Approx.contains(0L) && md5Approx.size == 10)
    val md5Recall = (exact intersect md5Approx).size / 10.0
    assert(md5Recall >= 0.8, s"md5-mode recall@10 = $md5Recall below 0.8")
  }

  test("annLsh rejects multi-row queries; an empty query set is the empty top-k") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // >=2 query rows stay a call-time error: the vec_id dedup would merge
    // result sets across queries — silent wrong answers
    val two = e.filter(col("vec_id").isin(0L, 1L)).select(col("embedding").as("qv"))
    val exTwo = intercept[IllegalArgumentException] { Similarity.annLsh(e, two, 10) }
    assert(exTwo.getMessage.contains("cosineTopKBatch"))
    // ZERO query rows (filtered-away id / empty shard) is a well-defined
    // ask — the empty result, schema intact, not an exception
    val none = e.filter(col("vec_id") === -1L).select(col("embedding").as("qv"))
    val out = Similarity.annLsh(e, none, 10)
    assert(out.columns.toSeq === Seq("vec_id", "label", "cos_sim"))
    assert(out.count() === 0)
  }

  test("batched top-k equals per-query brute force; top-k pushed below shuffle") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = e.filter(col("vec_id").isin(0L, 3L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.cosineTopKBatch(e, queries, 10)
    // WindowGroupLimit: each map task keeps only k rows per query before
    // the exchange — the property that makes this corpus-size-independent
    assert(batch.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val got = batch.select("query_id", "vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq(0L, 3L).foreach { qid =>
      val q = e.filter(col("vec_id") === qid).select(col("embedding").as("qv"))
      val single = Similarity.cosineTopK(e, q, 10)
        .select("vec_id").as[Long].collect().toSet
      assert(got(qid) == single, s"batch != single for query $qid")
    }
  }

  test("embedding canonical: one row per vector, mega-cluster collapses") {
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // 300 copies of vector 7 — the pair API would need ~45k pairs; the
    // canonical path stays one row per vector
    val copies = base.filter(col("vec_id") === 7)
      .crossJoin(spark.range(0, 300).select((col("id") + 7000000).as("cid")))
      .select(col("cid").as("vec_id"), col("embedding"))
    val corpus = base.unionByName(copies)
    val out = Similarity.embeddingCanonical(corpus, 0.999)
    assert(out.count() == corpus.count()) // exactly one row per vector
    // every copy maps to vec 7 (the minimum id in the duplicate cluster)
    val copyCanon = out.filter(col("vec_id") >= 7000000)
      .select("canonical_id").distinct().as[Long].collect()
    assert(copyCanon.toSeq == Seq(7L), s"copies mapped to ${copyCanon.mkString(",")}")
    // non-duplicate vectors stay their own canonical
    val selfCanon = out.filter(col("vec_id") < 7000000 && col("vec_id") =!= 7)
      .filter(!col("is_canonical")).count()
    assert(selfCanon == 0)
  }

  test("random projection: matches driver reference, preserves distances roughly") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (dIn, dOut) = (64, 8)
    val got = Similarity.randomProjection(e, dIn, dOut)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    // independent driver reference: same matrix definition, plain loops
    val R = Array.tabulate(dIn, dOut)((i, j) =>
      ((graft.text.Md5P61.base(s"graft_r:$i:$j") % 1001L) - 500L).toDouble / 500.0)
    val src = e.as[(Long, Array[Float], Int)].collect().map(r => r._1 -> r._2).toMap
    src.foreach { case (id, emb) =>
      val ref = (0 until dOut).map(j =>
        (0 until dIn).foldLeft(0.0)((acc, i) => acc + emb(i).toDouble * R(i)(j)))
      assert(got(id).toSeq == ref, s"vec $id")
    }
    // JL sanity via norm concentration: R entries are ~uniform[-1,1]
    // (variance 1/3), so E||Rx||^2 = (outDim/3)·||x||^2. The mean ratio
    // over the corpus concentrates tightly even at outDim = 8, unlike
    // pairwise rank correlation (measured ~0.38 here — ε is large at 8
    // dims by design; the sketch is a prefilter, not a metric).
    val ratios = src.toSeq.map { case (id, emb) =>
      val n2 = emb.map(x => x.toDouble * x.toDouble).sum
      val p2 = got(id).map(v => v * v).sum
      p2 / n2
    }
    val meanRatio = ratios.sum / ratios.size
    val expected = dOut / 3.0
    assert(math.abs(meanRatio / expected - 1.0) < 0.25,
      s"norm ratio $meanRatio far from JL expectation $expected")
    intercept[IllegalArgumentException] { Similarity.randomProjection(e, 0, 8) }
  }

  test("embedding dedup finds planted duplicates with cosine ~1") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planted = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val pairs = Similarity.embeddingDupPairs(
      e.select(col("vec_id"), col("embedding")).unionByName(planted), 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missing planted pair $i")
    }
  }

  test("knn graph: edges are mutual — a one-way top-k pick gets no edge") {
    // Tiny perturbations of one base direction + a single hyperplane so
    // every vector keeps the same projection sign (= same bucket).
    // Geometry at k=1:
    //   a and b are near-identical -> each other's top-1 -> edge (a,b)
    //   c is near b but b prefers a -> (b,c) is one-way -> NO edge
    def vec(d: Float): Seq[Float] = Seq.fill(63)(1.0f) :+ d
    val vecs = Seq(
      (1L, vec(0.00f)),   // a
      (2L, vec(0.01f)),   // b ~ a
      (3L, vec(0.03f)))   // c closer to b than to a
      .toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(vecs, k = 1, planes = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges == Set((1L, 2L)))
    // at k = 2 every pair is in both top-2 lists -> the full triangle
    val edges2 = Similarity.knnGraph(vecs, k = 2, planes = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges2 == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    intercept[IllegalArgumentException] { Similarity.knnGraph(vecs, 0) }
  }
}
