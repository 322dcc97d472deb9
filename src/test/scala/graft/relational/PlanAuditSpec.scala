package graft.relational

import graft.SparkSpec

/** Regression net over the whole registry's PHYSICAL plans: correctness
  * tests can't catch a plan that silently degrades to a cartesian product
  * (it still computes the right answer — until it meets real data).
  * Small-side broadcasts legitimately plan as BroadcastNestedLoopJoin
  * (1-row bounds frames, query vectors), so only the truly pathological
  * shape is banned.
  */
class PlanAuditSpec extends SparkSpec {

  // stream_* run a real streaming query inside the builder (AvailableNow +
  // awaitTermination) — they are executed, not planned, so auditing them
  // here would re-run the streaming machinery for no plan information.
  // (A few other builders run small setup jobs at construction — the wrm
  // ingest, bucket-size counts, IVF training — that's accepted cost; this
  // spec's assertion is still about the RETURNED plan.)
  private val skip = Set(
    "stream_hourly_window", "stream_latest_per_user",
    "stream_purchase_view_join", "stream_doc_dedup", "stream_token_topk",
    "stream_session_window")

  test("registry names are unique (SparkEntry.queries is a Map — a duplicate would silently shadow)") {
    val names = graft.SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
    assert(names.forall(_.matches("[a-z0-9_]+")),
      s"non-snake-case names: ${names.filterNot(_.matches("[a-z0-9_]+")).mkString(", ")}")
  }

  test("EVERY registry query carries a DuckDB oracle (no rows-only checks)") {
    // Every operator is hash-checked against an independent engine — pin it
    // so a future operator can't quietly ship with the weaker rows>0 check.
    // As of round 11 there are NO exceptions: even the IVF build surface
    // runs a deterministic md5-seeded configuration whose Lloyd rounds the
    // oracle unrolls as CTE stages.
    val missing = graft.SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less registry queries: ${missing.mkString(", ")}")
  }

  test("no registry query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n$plan")
    }
  }

  test("unpartitioned Window nodes sit only above aggregated (reduced) input") {
    // A window with no PARTITION BY executes in ONE task. That is the
    // deliberate shape for the tiny per-group offset frames in the
    // hierarchical prefix-sum/rank operators (q66-q68) — where the window
    // input is already an aggregate, corpus/groupSize rows — and a scale
    // bug anywhere else. Pin the invariant: every unpartitioned WindowExec
    // must have an aggregation somewhere below it.
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty &&
              w.child.collectFirst {
                case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
              }.isEmpty => w
      }
      assert(bad.isEmpty,
        s"${q.name} plans an unpartitioned Window over non-aggregated input " +
          s"(single-task global window):\n${bad.headOption.getOrElse("")}")
    }
  }

  test("no broadcast hint over an unbounded-cardinality grouped aggregate") {
    // A broadcast() hint FORCES BroadcastHashJoin regardless of
    // autoBroadcastJoinThreshold — over a grouped aggregate whose key
    // cardinality grows with the data (a token vocabulary, a per-group
    // frequency table) that OOMs the driver at corpus scale (the r7 q65
    // defect). Global aggregates (empty grouping → ≤1 row) and
    // LocalRelations are fine; grouped aggregates under a hint need an
    // explicit entry here with a boundedness argument.
    val bounded = Map(
      // l_returnflag is a 3-value domain key — the aggregate is O(1)
      "q37_approx_distinct" -> "grouped by l_returnflag (domain-bounded, 3 values)",
      // the contamination benchmark is a fixed eval set; its gram table
      // is bounded by the benchmark size, not the corpus
      "q58_contamination" -> "eval-benchmark grams (fixed set, corpus-independent)",
      // centroid/stats broadcasts sit over a (dim)-grouped aggregate —
      // dim is the embedding dimensionality (64), a schema constant
      "q76_embedding_outliers" -> "grouped by dim (schema-bounded, 64 values)",
      // the hint wraps a GLOBAL 1-row node count; the grouped aggregate the
      // walk finds below it is the co-purchase edge input's support counts —
      // part of the count's lineage, never the broadcast payload
      "q93_pagerank" -> "hinted relation is a global count (1 row by construction)",
      // the hint wraps the global 1-row scale = min(c/w); the per-source
      // count aggregate the walk finds is the min's input, not the payload
      "q96_mixture_resample" -> "hinted relation is a global min (1 row by construction)",
      // label is a classification-taxonomy key (like l_returnflag): the
      // centroid table is O(labels × dims), bounded by the label domain
      // and the schema dim constant, not corpus size
      "q137_class_separation" -> "grouped by label (taxonomy-bounded domain) × dim (schema constant)",
      // the hint wraps a GLOBAL 1-row basket count; the grouped aggregate
      // the walk finds below it is the distinct-items input of that
      // count's lineage, never the broadcast payload (the q93 class)
      "q146_pair_lift" -> "hinted relation is a global count (1 row by construction)",
      // the cross-bucket prune table is grouped by the price range bucket —
      // construction-bounded at nBuckets (32) rows whatever the data size
      "q151_skyline" -> "grouped by range bucket (construction-bounded, <= nBuckets=32)",
      // the hint wraps the GLOBAL 1-row total count; the digit-grouped
      // aggregate the walk finds below it is that total's lineage (and is
      // itself domain-bounded at 9 digits), never the broadcast payload
      "q152_benford" -> "hinted relation is a global count (1 row by construction)",
      // the hint wraps the GLOBAL 1-row mean of the daily-count series; the
      // date-grouped aggregate below is the mean's lineage, not the payload
      "q154_cusum" -> "hinted relation is a global mean (1 row by construction)",
      // the hint wraps the GLOBAL 1-row byte total; the shard-grouped
      // aggregate below is the total's lineage (itself bounded at nShards)
      "q170_shard_balance" -> "hinted relation is a global sum (1 row by construction)",
      // the hint wraps the GLOBAL 1-row depth stats of the sweep; the
      // grouped aggregates below (per-file spans, boundary nets) are its
      // lineage, themselves bounded at O(files)
      "q171_clustering_depth" -> "hinted relation is a global max/avg (1 row by construction)",
      // the centroid row is dim-grouped — bounded by the schema's 64
      // dims (the q76 class), collapsed to ONE row before the hint
      "q175_pr_curve" -> "grouped by dim (schema-bounded, 64 values), 1 row after collect_list",
      // the per-dim range table is dim-grouped — bounded by the schema's
      // dims (the q76 class); unhinted it planned as a 64-key sort-merge
      // exchange of the full exploded value stream
      "q130_quantization_audit" -> "grouped by dim (schema-bounded, 64 values)",
      // the hint wraps the GLOBAL 1-row basket count (the q146 class)
      "q176_assoc_rules" -> "hinted relation is a global count (1 row by construction)",
      // the hint wraps the GLOBAL 1-row watermark (max of per-type maxes);
      // the type-grouped aggregate below is its lineage, bounded at O(types)
      "q182_freshness" -> "hinted relation is a global max (1 row by construction)")
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, ResolvedHint}
    graft.SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
      val analyzed = q.run(spark, dir).queryExecution.analyzed
      val offenders = analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
            h.child.collectFirst {
              case a: Aggregate if a.groupingExpressions.nonEmpty => a
            }.nonEmpty => h
      }
      assert(offenders.isEmpty || bounded.contains(q.name),
        s"${q.name} broadcast-hints a grouped aggregate (forced broadcast of " +
          s"data-dependent cardinality — the q65 class):\n${offenders.headOption.getOrElse("")}")
    }
  }

  test("basket family exchange budget: the r11 two-shuffle pair pipeline holds") {
    // The co-purchase rewrite (baskets via ONE orderkey aggregate + in-row
    // pair expansion) replaced a 4-exchange distinct+self-join shape. Pin
    // the shuffle budget so a refactor can't silently reintroduce it:
    // q87 = basket agg + pair agg + presentation sort = 3 shuffle
    // exchanges; q138 adds the rank window's item exchange and its final
    // sort. Counts are on the pre-AQE spark plan (deterministic).
    // String-count on the executed plan: with AQE the top node is an
    // AdaptiveSparkPlanExec wrapper, so a collect() over the tree sees no
    // exchanges; the rendered plan shows them.
    val dir = "/root/testdata/sf0.001"
    def hashShuffles(name: String): Int =
      "Exchange hashpartitioning".r.findAllIn(
        graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString).size
    // q87: basket agg + pair agg (the presentation sort adds one RANGE
    // exchange on top — not counted; it's output ordering, not data
    // movement the operators need). q138 adds the rank window's item
    // exchange; q146/q176 add the margin joins (their broadcast
    // exchanges are the intended slim-side shape). q95's returned plan
    // hangs off the final label checkpoint (rounds already cut).
    val budget = Map("q87_copurchase" -> 2, "q138_also_bought" -> 3,
      "q146_pair_lift" -> 3, "q176_assoc_rules" -> 3, "q95_communities" -> 0)
    budget.foreach { case (name, cap) =>
      val n = hashShuffles(name)
      assert(n <= cap, s"$name plans $n hash-shuffle exchanges (budget $cap)")
    }
  }

  test("in-row quantile family plans no window and one data shuffle") {
    // q116/q123 (r12 rewrite): bounded groups -> sort_array(collect_list)
    // + rank indexing in ONE aggregate. Pin the shape so a refactor can't
    // reintroduce the count-table windows + self-joins that degenerated
    // on the near-unique value column (count table ~ fact table).
    val dir = "/root/testdata/sf0.001"
    Seq("q116_mad_outliers", "q123_winsorized_stats").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), s"$name plans a window:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        s"$name plans a join:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles <= 1, s"$name plans $shuffles hash shuffles (budget 1)")
    }
  }

  test("pair-dedup query CONSTRUCTION runs no Spark job (lazy bucket cap)") {
    // capBuckets once ran an eager count+cache during plan build — callers
    // paid a cluster job just to *define* a DataFrame. Pin the fix: build
    // the pair pipelines and assert zero jobs were submitted.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        descs.add(js.stageInfos.map(_.name).mkString("; "))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      graft.text.TextDedup.minhashDupPairs(docs, maxBucketSize = 10)
      graft.text.TextDedup.simhashDupPairs(docs, maxBucketSize = 10)
      graft.vector.Similarity.embeddingDupPairs(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding")),
        threshold = 0.999, maxBucketSize = 10)
      // Listener events are async with no public bus-drain API, but they
      // are delivered IN ORDER: run a sentinel job and wait for it — once
      // its JobStart arrives, any construction-time job would already
      // have been counted. The sentinel is an RDD action (exactly ONE
      // job): a DataFrame count() under AQE materializes its shuffle
      // stage as a separate job and would miscount.
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 30000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(jobs.get() == 1,
        s"building the pair-dedup plans submitted ${jobs.get() - 1} Spark job(s): " +
          descs.toArray.mkString(" | "))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("r13 serialization fixes keep their plan shape (pins + broadcast)") {
    // The round-13 sweep fixed four single-task/serialized CPU stages.
    // Pin the shapes so a refactor can't silently reintroduce them:
    //  - q130: the 64-row per-dim range table must join by BROADCAST —
    //    unhinted it planned a sort-merge whose dim-keyed exchange of the
    //    full exploded value stream byte-coalesced to one task;
    //  - q80 / q126 / q153: the CPU-dense exchanges (dominance bucket
    //    pairs, dup-pair bucket pairs, the per-nation rank window) must
    //    stay explicitly pinned — REPARTITION_BY_NUM is the one shuffle
    //    origin AQE's byte-based coalescing leaves alone.
    val dir = "/root/testdata/sf0.001"
    def plan(name: String): String =
      graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString

    val q130 = plan("q130_quantization_audit")
    assert(q130.contains("BroadcastHashJoin"),
      s"q130's range join is not a broadcast:\n$q130")
    assert(!q130.contains("SortMergeJoin"),
      s"q130 plans a sort-merge join:\n$q130")

    Map("q80_semantic_dedup" -> 2, "q126_knn_graph" -> 2,
        "q153_gini_revenue" -> 1).foreach { case (name, minPins) =>
      val p = plan(name)
      val pins = "REPARTITION_BY_NUM".r.findAllIn(p).size
      assert(pins >= minPins,
        s"$name carries $pins pinned exchanges (expected >= $minPins):\n$p")
    }
  }
}
