package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators: exact (hash groupBy), MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the point of these operators is the 100 TB corpus case):
  *  - exact dedup is a single hash-shuffle on a 128-bit digest (never on the
  *    raw text — the shuffle carries 16 bytes + ids, not documents);
  *  - MinHash/LSH candidate generation shuffles (band_id, band_hash) keys
  *    only; pair verification joins shingle SETS for candidates only, never
  *    the full cross product;
  *  - signatures are computed with codegen'd higher-order functions
  *    (transform/aggregate over token arrays) — no UDF, no RDD;
  *  - all hashing is xxhash64 (deterministic, seedable via an extra column),
  *    so results are stable across partitionings and re-runs.
  */
object TextDedup {

  /** Token n-gram shingles (default 3) as a distinct array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val cnt = greatest(size(toks) - (n - 1), lit(0))
    // Build n-grams by zipping n shifted slices of the token array — NOT by
    // indexing with element_at inside a transform lambda: a lambda-embedded
    // reference to `toks` re-evaluates the tokenizer per element, turning
    // shingling O(tokens²). Slices evaluate it a constant n+1 times.
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), cnt))
    val grams = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    array_distinct(grams)
  }

  /** LSH band keys: split the k-row signature into `bands` bands of
    * k/bands rows each; band key = hash of the band's slice.
    */
  def bandKeys(sig: Column, k: Int = 16, bands: Int = 4): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band_id"),
        xxhash64(slice(sig, b * rows + 1, rows).cast("array<string>").cast("string"))
          .as("band_hash"))
    }: _*)
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Drop LSH buckets holding more than `cap` members before a bucket
    * self-join, logging what was dropped. The pair join is O(bucket²): one
    * hot bucket (boilerplate text, near-constant embeddings) turns a
    * linear candidate pass into a quadratic blow-up at corpus scale. A
    * bucket with >cap members is, at any sane cap, a single massive
    * duplicate cluster — the canonical/cluster APIs (one row per doc)
    * are the right tool for those; the PAIR api caps them.
    */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String],
                                cap: Int, what: String): DataFrame = {
    val sizes = banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bucket_n"))
    val hot = sizes.filter(col("bucket_n") > cap)
    val dropped = hot.agg(count(lit(1)), sum(col("bucket_n"))).collect()(0)
    if (!dropped.isNullAt(1) && dropped.getLong(0) > 0)
      log.warn(s"$what: dropping ${dropped.getLong(0)} bucket(s) over " +
        s"cap=$cap (${dropped.getLong(1)} member rows) from pair emission; " +
        "use the canonical/cluster dedup APIs for massive duplicate clusters")
    banded.join(hot.select(keys.map(col): _*), keys, "left_anti")
  }

  /** MinHash-LSH near-duplicate pairs over `documents`:
    * shingle → signature → band-bucket join → Jaccard verify ≥ threshold.
    * Returns (doc_a, doc_b, est_jaccard, jaccard).
    *
    * `maxBucketSize` bounds the O(bucket²) candidate join (see capBuckets).
    */
  def minhashDupPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5,
                      maxBucketSize: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    // Shingle + sign ONCE (native kernel expressions) and cache: the table
    // is reused for band explode and twice for candidate verification. At
    // 100 TB this is a persisted intermediate; the key property is the
    // same — downstream shuffles never carry document shingles, only
    // (ids, band keys) and, for the candidate pairs only, the two joined
    // shingle sets.
    val sigs = docs
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TextExprs.minhashSig(spark, col("sh"), k))
      .cache()

    // LSH candidate generation: shuffle only (band_id, band_hash, doc_id).
    val bandedAll = sigs
      .select(col("doc_id"), explode(bandKeys(col("sig"), k, bands)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
    val banded = capBuckets(bandedAll, Seq("band_id", "band_hash"),
      maxBucketSize, "minhashDupPairs")
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_id", "band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()

    // Verification: join shingle sets back for the (few) candidates only.
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / lit(k.toDouble))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
  }

  /** 64-bit SimHash from token hashes: bit b of the fingerprint is set when
    * more token-hashes have bit b set than unset.
    *
    * Single pass: tokens are hashed once (aggregate input); the per-bit
    * vote counters are a 64-wide array accumulator updated via zip_with
    * against a constant mask array. (64 separate aggregate expressions
    * would re-tokenize + re-hash the text 64 times.)
    */
  def simhash(text: Column): Column = {
    val masks = typedLit((0 until 64).map(1L << _))
    val counts = aggregate(
      transform(TextAnalysis.tokens(text), t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (c, m) => c + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(0L)))
    val n = TextAnalysis.tokenCount(text)
    aggregate(
      zip_with(counts, masks, (c, m) => when(c * 2 >= n, m).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** Scalable dedup output: instead of emitting every near-duplicate PAIR
    * (O(cluster²) rows — a duplicate cluster of 1000 copies explodes into
    * half a million pairs), assign each doc at most ONE canonical
    * candidate: the minimum doc_id sharing any LSH band bucket, verified
    * by Jaccard. Output is one row per document.
    *
    * Chained clusters (A~B~C with A,C not bucket-colliding) keep separate
    * canonicals after one pass — full transitive closure is an iterated
    * pass or a connected-components job; exact-duplicate clusters always
    * collapse in one pass (identical docs share all buckets).
    */
  def minhashCanonical(docs: DataFrame, k: Int = 16, bands: Int = 4,
                       threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val sigs = docs
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val banded = sigs
      .select(col("doc_id"),
        explode(bandKeys(TextExprs.minhashSig(spark, col("sh"), k), k, bands)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
    // min doc id per bucket, then min candidate per doc — rows stay O(docs)
    val bucketMin = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(min(col("doc_id")).as("bucket_min"))
    val candidate = banded.join(bucketMin, Seq("band_id", "band_hash"))
      .groupBy(col("doc_id"))
      .agg(min(col("bucket_min")).as("cand"))
      .filter(col("cand") < col("doc_id"))
    // verify the single candidate pair per doc
    val verified = candidate
      .join(sigs.select(col("doc_id"), col("sh")), "doc_id")
      .join(sigs.select(col("doc_id").as("cand"), col("sh").as("sh_c")), "cand")
      .filter(jaccard(col("sh"), col("sh_c")) >= threshold)
      .select(col("doc_id"), col("cand").as("canonical_id"))
    docs.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"),
        col("canonical_id").isNull.as("is_canonical"))
  }

  /** Transitive-closure dedup clustering: connected components over the
    * LSH bucket graph, by iterative min-label propagation.
    *
    * Edge set stays O(docs·bands): within each band bucket every doc gets
    * ONE star edge to the bucket's minimum doc_id (never the O(bucket²)
    * clique), Jaccard-verified so a hash collision can't weld two unrelated
    * clusters. Propagation then runs label(v) ← min(label(v),
    * min(label(neighbors))) until a fixpoint; every iteration
    * localCheckpoints to truncate lineage (otherwise the plan doubles per
    * loop and Catalyst planning time dominates). Convergence is bounded by
    * the cluster graph's diameter — short for duplicate clusters (stars
    * around exact copies); adversarially long chains would want the
    * large-star/small-star variant, which keeps the same per-iteration
    * plan shape.
    */
  def minhashClusters(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5, maxIter: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    val sigs = docs
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val banded = sigs
      .select(col("doc_id"),
        explode(bandKeys(TextExprs.minhashSig(spark, col("sh"), k), k, bands)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
    val bucketMin = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(min(col("doc_id")).as("dst"))
    val starEdges = banded.join(bucketMin, Seq("band_id", "band_hash"))
      .filter(col("doc_id") =!= col("dst"))
      .select(col("doc_id").as("src"), col("dst"))
      .distinct()
    val verified = starEdges
      .join(sigs.select(col("doc_id").as("src"), col("sh").as("sh_s")), "src")
      .join(sigs.select(col("doc_id").as("dst"), col("sh").as("sh_d")), "dst")
      .filter(jaccard(col("sh_s"), col("sh_d")) >= threshold)
      .select(col("src"), col("dst"))
    // propagation needs both directions (min ids must also flow "up" hubs)
    val edges = verified
      .union(verified.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val step = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"), labels("label").as("old_label"),
          least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"))
        .localCheckpoint()
      converged = step.filter(col("old_label") =!= col("label")).isEmpty
      labels = step.select(col("doc_id"), col("label"))
      iter += 1
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"),
      (col("doc_id") === col("label")).as("is_canonical"))
  }

  // ---- query wrappers ----------------------------------------------------

  /** Exact dedup by content hash (md5 matches DuckDB's md5 for the oracle;
    * at scale use xxhash64/sha2-256 — same plan shape).
    */
  val qExactDedup = GraftQuery(
    "q20_exact_dedup",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select(col("canonical_id"), col("n_copies"), col("text_hash"))
        .orderBy(col("canonical_id")),
    Some("""
      SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
             md5(text) AS text_hash
      FROM documents
      GROUP BY md5(text)
      ORDER BY canonical_id"""))

  /** n-gram Jaccard similarity on deterministic candidate pairs (adjacent
    * doc_ids within a source) — the verification kernel of MinHash dedup,
    * oracle-checkable in ANSI SQL.
    */
  val qNgramJaccard = GraftQuery(
    "q25_ngram_jaccard",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      // Equi-join on the derived doc key (doc_a+20) AND source: Catalyst
      // hash-joins on both keys, producing only the ~n candidate pairs —
      // joining on source alone would build every within-source pair
      // (O(n²/sources)) and filter afterwards.
      def sh2 = TextExprs.tokenShingles(s, TextAnalysis.tokens(col("text")), 2)
      val a = d.select(col("doc_id").as("doc_a"), col("source"),
        (col("doc_id") + 20).as("pair_key"), sh2.as("sh_a"))
      val b = d.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
        sh2.as("sh_b"))
      a.join(b, col("pair_key") === col("doc_b") && col("source") === col("source_b"))
        .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .orderBy(col("doc_a"))
    },
    Some("""
      WITH sh AS (
        SELECT doc_id, source,
          list_distinct(list_transform(
            generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 0)),
            i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                 regexp_split_to_array(trim(text), '\s+')[i+1])) AS grams
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(list_distinct(a.grams || b.grams)) END AS jaccard
      FROM sh a JOIN sh b
        ON a.source = b.source AND b.doc_id = a.doc_id + 20
      ORDER BY doc_a"""))

  /** MinHash+LSH near-dup pairs — not ANSI-expressible (xxhash64), driver
    * does a rows-only check; ScalaTest asserts semantics on planted dups.
    */
  val qMinhash = GraftQuery(
    "q26_minhash_lsh_dedup",
    (s, dir) => {
      // Plant near-duplicates so the operator has work to do at any SF:
      // each source's lexicographically-first doc gets a 95%-prefix twin.
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(substring(col("text"), 1, 10000), lit(" planted tail")).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      minhashDupPairs(corpus, threshold = 0.3).orderBy(col("doc_a"), col("doc_b"))
    },
    None)

  val qSimhash = GraftQuery(
    "q27_simhash",
    (s, dir) =>
      // sort before the hash projection: the range exchange samples only
      // the scan, and the fingerprint is computed exactly once per doc
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          TextExprs.simhash64(s, TextAnalysis.tokens(col("text"))).as("simhash64")),
    None)

  /** Canonical-assignment dedup over documents + planted duplicates:
    * one output row per doc (the scale-safe dedup shape).
    */
  val qMinhashCanonical = GraftQuery(
    "q50_minhash_canonical",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
      minhashCanonical(d.select(col("doc_id"), col("text")).unionByName(planted),
        threshold = 0.5)
        .orderBy(col("doc_id"))
    },
    None)

  /** Transitive dedup clusters over documents + planted chained near-dups:
    * exercises the connected-components path (rows-only; semantics pinned
    * by TextSpec's chain-transitivity test).
    */
  val qDedupClusters = GraftQuery(
    "q51_dedup_clusters",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
      minhashClusters(d.select(col("doc_id"), col("text")).unionByName(planted),
        threshold = 0.5)
        .orderBy(col("doc_id"))
    },
    None)

  val queries: Seq[GraftQuery] =
    Seq(qExactDedup, qNgramJaccard, qMinhash, qSimhash, qMinhashCanonical,
      qDedupClusters)
}
