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
  *  - MinHash/LSH candidate generation shuffles (band_id, band_key) keys
  *    only; pair verification joins shingle SETS for candidates only, never
  *    the full cross product;
  *  - signatures are computed with native kernel expressions (tight loops
  *    per row) — no UDF, no RDD;
  *  - hashing defaults to xxhash64 (deterministic, stable across
  *    partitionings and re-runs); the registry queries run the kernels in
  *    "md5" mode ([[Md5P61]]) — same algorithms, ANSI-expressible hash —
  *    so the driver's DuckDB oracle hash-checks the full pipelines.
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
    * k/bands rows each. `hashed=true` (the scale default) keys each band
    * by an 8-byte xxhash64 of its slice; `hashed=false` keys by the slice
    * ARRAY itself — slightly wider shuffle keys, but expressible in ANSI
    * SQL (DuckDB groups/joins on lists), which is what the md5-mode
    * oracle queries need.
    */
  def bandKeys(sig: Column, k: Int = 16, bands: Int = 4,
               hashed: Boolean = true): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      val sl = slice(sig, b * rows + 1, rows)
      struct(
        lit(b).as("band_id"),
        (if (hashed) xxhash64(sl.cast("array<string>").cast("string")) else sl)
          .as("band_key"))
    }: _*)
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Asymmetric set containment |A∩B| / |A|: how much of A is inside B.
    * The quote/subset detector — a short doc fully contained in a long one
    * has containment ≈ 1 while its Jaccard is tiny (the union is dominated
    * by B), so Jaccard-threshold dedup never sees it.
    */
  def containment(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val na = size(a).cast("double")
    when(na === 0, lit(0.0)).otherwise(inter / na)
  }

  /** Estimated Jaccard from two k-row MinHash signatures: fraction of
    * agreeing positions.
    */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB,
      (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, v) => acc + v) / lit(k.toDouble)

  /** Drop LSH buckets holding more than `cap` members before a bucket
    * self-join. The pair join is O(bucket²): one hot bucket (boilerplate
    * text, near-constant embeddings) turns a linear candidate pass into a
    * quadratic blow-up at corpus scale. A bucket with >cap members is, at
    * any sane cap, a single massive duplicate cluster — the
    * canonical/cluster APIs (one row per doc) are the right tool for
    * those; the PAIR api caps them.
    *
    * Lazy by construction: a window count over the banding keys, then a
    * filter — NO job runs at plan-build time (an earlier version ran an
    * eager count + cache here, which doubled q26 and made the pair APIs
    * do work during query construction). Both sides of the caller's
    * self-join re-derive this plan from the caller's cached signature
    * frame (explode + window over in-memory blocks — cheap); after the
    * cap filter one side is typically small enough that AQE broadcasts
    * it. Callers wanting drop diagnostics can run the inverse filter
    * (`bucket_n > cap`) as a separate cheap aggregate.
    */
  private[graft] def capBuckets(bandedIn: DataFrame, keys: Seq[String],
                                cap: Int, what: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    bandedIn
      .withColumn("__bucket_n", count(lit(1)).over(w))
      .filter(col("__bucket_n") <= cap)
      .drop("__bucket_n")
  }

  /** Unordered within-block self-pair expansion with the triangular bucket
    * cover (the q129 prefix-join / q80 dominance-join pattern, shared):
    * split each block into g = ⌈n/bucketSize⌉ hash buckets on the id and
    * join on (keys, i, j) bucket pairs with i ≤ j — an exact cover of the
    * unordered in-block pair set (an off-diagonal pair appears exactly
    * once, oriented by bucket; a diagonal one dedupes by id order). A
    * plain keys-only self-join computes a whole block's O(n²) expansion in
    * the one task holding the block, and AQE's byte-based coalescing folds
    * the low-byte/high-CPU exchange further — the cover spreads a block
    * over g(g+1)/2 independent join keys and pins both exchanges at the
    * session parallelism (REPARTITION_BY_NUM is exempt from coalescing).
    * Output: keys ++ <id,payload>_a ++ <id,payload>_b, one row per
    * unordered pair; orientation is arbitrary, so normalize downstream
    * with least/greatest if the consumer is not symmetric.
    */
  private[graft] def triangularSelfPairs(blocked: DataFrame, keys: Seq[String],
                                         idCol: String, payload: Seq[String],
                                         bucketSize: Int): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val sides = idCol +: payload
    val bucketed = blocked
      .withColumn("__g",
        ((count(lit(1)).over(w) + lit(bucketSize - 1)) / lit(bucketSize))
          .cast("int"))
      .withColumn("__b", pmod(xxhash64(col(idCol)), col("__g")).cast("int"))
    val keyCols = keys.map(col)
    val aSide = bucketed.select(keyCols ++ Seq(col("__b").as("__i"),
      explode(sequence(col("__b"), col("__g") - 1)).as("__j")) ++
      sides.map(c => col(c).as(s"${c}_a")): _*)
    val bSide = bucketed.select(keyCols ++ Seq(
      explode(sequence(lit(0), col("__b"))).as("__i"), col("__b").as("__j")) ++
      sides.map(c => col(c).as(s"${c}_b")): _*)
    val p = blocked.sparkSession.sessionState.conf.numShufflePartitions
    val jk = keys ++ Seq("__i", "__j")
    aSide.repartition(p, jk.map(col): _*)
      .join(bSide.repartition(p, jk.map(col): _*), jk)
      .filter(col(s"${idCol}_a") =!= col(s"${idCol}_b"))
      .filter(col("__i") =!= col("__j") ||
        col(s"${idCol}_a") < col(s"${idCol}_b"))
      .drop("__i", "__j")
  }

  /** MinHash-LSH near-duplicate pairs over `documents`:
    * shingle → signature → band-bucket join → Jaccard verify ≥ threshold.
    * Returns (doc_a, doc_b, est_jaccard, jaccard).
    *
    * `maxBucketSize` bounds the O(bucket²) candidate join (see capBuckets).
    */
  def minhashDupPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5,
                      maxBucketSize: Int = 1000,
                      hashMode: String = "xx"): DataFrame = {
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
      .withColumn("sig", TextExprs.minhashSig(spark, col("sh"), k, hashMode))
      .cache()

    // LSH candidate generation: shuffle only (band_id, band_key, doc_id).
    val bandedAll = sigs
      .select(col("doc_id"),
        explode(bandKeys(col("sig"), k, bands, hashed = !TextExprs.isMd5Mode(hashMode))).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"))
    val banded = capBuckets(bandedAll, Seq("band_id", "band_key"),
      maxBucketSize, "minhashDupPairs")
    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_id", "band_key"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()

    // Verification: join shingle sets back for the (few) candidates only.
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), k))
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
                       threshold: Double = 0.5,
                       hashMode: String = "xx"): DataFrame = {
    val spark = docs.sparkSession
    val sigs = docs
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val banded = sigs
      .select(col("doc_id"),
        explode(bandKeys(TextExprs.minhashSig(spark, col("sh"), k, hashMode), k, bands,
          hashed = !TextExprs.isMd5Mode(hashMode))).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"))
    // min doc id per bucket, then min candidate per doc — rows stay O(docs)
    val bucketMin = banded.groupBy(col("band_id"), col("band_key"))
      .agg(min(col("doc_id")).as("bucket_min"))
    val candidate = banded.join(bucketMin, Seq("band_id", "band_key"))
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
    * clusters. Components are then solved by alternating
    * large-star/small-star rounds (see connectedComponents) — O(log n)
    * rounds on any graph, so even adversarial near-dup chains longer than
    * the iteration budget cluster correctly.
    */
  def minhashClusters(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5, maxIter: Int = 20,
                      hashMode: String = "xx"): DataFrame = {
    val spark = docs.sparkSession
    val sigs = docs
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val banded = sigs
      .select(col("doc_id"),
        explode(bandKeys(TextExprs.minhashSig(spark, col("sh"), k, hashMode), k, bands,
          hashed = !TextExprs.isMd5Mode(hashMode))).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"))
    val bucketMin = banded.groupBy(col("band_id"), col("band_key"))
      .agg(min(col("doc_id")).as("dst"))
    val starEdges = banded.join(bucketMin, Seq("band_id", "band_key"))
      .filter(col("doc_id") =!= col("dst"))
      .select(col("doc_id").as("src"), col("dst"))
      .distinct()
    val verified = starEdges
      .join(sigs.select(col("doc_id").as("src"), col("sh").as("sh_s")), "src")
      .join(sigs.select(col("doc_id").as("dst"), col("sh").as("sh_d")), "dst")
      .filter(jaccard(col("sh_s"), col("sh_d")) >= threshold)
      .select(col("src"), col("dst"))
    connectedComponents(docs.select(col("doc_id")), verified, maxIter)
  }

  /** Edge-count cutoff below which [[connectedComponents]] may collect the
    * deduped edge set and union-find on the driver. Derived from driver
    * memory, not a constant: budget 5% of the heap, at a conservative
    * ~250 bytes per collected edge (GenericRow + two boxed Longs + the
    * union-find HashMap entries), floored at 100k edges so tiny test
    * drivers still take the measured-2×-faster local path on fixture-size
    * graphs. Reads `spark.driver.memory` when set (the cluster-submit
    * case); falls back to the live JVM heap (`Runtime.maxMemory`), which
    * in local mode IS the driver heap. 8 GiB driver → ~1.7M edges.
    */
  private[graft] def defaultDriverThreshold(spark: org.apache.spark.sql.SparkSession): Long =
    defaultDriverThresholdFor(
      spark.sparkContext.getConf.getOption("spark.driver.memory"))

  private[graft] def defaultDriverThresholdFor(driverMemory: Option[String]): Long = {
    // byteStringAsMb, not AsBytes: Spark itself parses a UNITLESS
    // spark.driver.memory as MiB (SparkContext memory confs default to
    // the MiB suffix), so "4096" means 4 GiB — AsBytes would read it as
    // 4096 BYTES and collapse the threshold to the floor
    val heapBytes: Long = driverMemory
      .flatMap(s => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsMb(s) * 1024L * 1024L).toOption)
      .getOrElse(Runtime.getRuntime.maxMemory())
    math.max(100000L, heapBytes / 20 / 250)
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * converges in O(log n) rounds on ANY graph — plain min-label
    * propagation needs O(diameter) iterations, so an adversarial
    * near-dup CHAIN longer than maxIter would silently mis-cluster.
    * Every step is a groupBy + join over (long, long) edge pairs; rounds
    * localCheckpoint to truncate lineage, and convergence is detected by
    * an (edge-count, xxhash-sum) signature — one tiny scalar aggregate
    * per round instead of a full except().
    *
    * Returns (doc_id, cluster_id = component minimum, is_canonical);
    * `nodes` supplies isolated vertices, which self-label.
    */
  private[graft] def connectedComponents(nodes: DataFrame, edgesIn: DataFrame,
                                         maxIter: Int = 25,
                                         driverThreshold: Long = -1L): DataFrame = {
    // large-star: for every neighbor v > u, link v to m = min(Γ(u) ∪ {u});
    // output edges are oriented large→small
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // small-star: on large→small edges, link every neighbor AND u itself
    // to the minimum neighbor
    def smallStar(e: DataFrame): DataFrame = {
      val or2 = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mins = or2.groupBy(col("u")).agg(min(col("v")).as("m"))
      or2.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: ANSI mode throws on long-sum overflow and hash
      // sums overflow immediately; xor is order-independent and wrap-free
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // LAZY local checkpoints throughout the loop: the signature probe
    // that follows every checkpoint is itself an action, so it
    // materializes the cached partitions in the same job — eager
    // checkpointing ran a separate materialization job per round (2 jobs
    // per iteration instead of 1, pure scheduling floor at bench scale)
    var edges = edgesIn
      .select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    var sig = signature(edges)

    // Size-adaptive fast path: the deduped edge set of a dedup graph is
    // O(docs·bands) — when it fits comfortably on the driver, a local
    // union-find replaces ~6 Spark jobs per alternating-star round with
    // one collect (measured ~2× on the registry query). The distributed
    // path remains the 100 TB route and is exercised by the spec with
    // driverThreshold = 0. The default threshold is DERIVED from driver
    // memory ([[defaultDriverThreshold]]), not a constant: a fixed cutoff
    // would either OOM a small driver on an edge set that narrowly fits
    // the constant, or send a large driver's easily-collectable graph
    // down the slow distributed path.
    val effThreshold =
      if (driverThreshold >= 0) driverThreshold
      else defaultDriverThreshold(nodes.sparkSession)
    val labels: DataFrame =
      if (sig._1 <= effThreshold) {
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
          var c = x
          while (parent.getOrDefault(c, c) != c) {
            val n = parent.getOrDefault(c, c); parent.put(c, r); c = n
          }
          r
        }
        edges.select(col("u"), col("v")).collect().foreach { row =>
          val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
          // union toward the smaller id: the root IS the component minimum
          if (a < b) parent.put(b, a) else if (b < a) parent.put(a, b)
        }
        val spark = nodes.sparkSession
        import scala.jdk.CollectionConverters._
        val resolved = parent.keySet().asScala.toSeq.map(x => (x, find(x)))
        import spark.implicits._
        broadcast(resolved.toDF("doc_id", "label"))
      } else {
        var iter = 0
        var converged = sig._1 == 0
        while (iter < maxIter && !converged) {
          edges = smallStar(largeStar(edges)).localCheckpoint(false)
          val next = signature(edges)
          converged = next == sig
          sig = next
          iter += 1
        }
        // converged star graph: every non-root points at its component min
        edges.groupBy(col("u").as("doc_id")).agg(min(col("v")).as("label"))
      }
    nodes.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  // ---- DuckDB oracle fragments for the md5-mode queries ------------------
  //
  // The registry's dedup queries run the kernels in "md5" hash mode
  // ([[Md5P61]]) precisely so these transliterations are possible: every
  // stage (shingling, base hash, family rehash, banding, jaccard verify)
  // is written once here and composed per query. xxhash64 remains the
  // default for the library APIs — the hash is a parameter of the
  // algorithm, not its semantics, so the oracle proves the ALGORITHM.

  /** corpus := documents plus the 20 lowest-doc_id docs re-planted at
    * +1000000 (exact copies, or 95%-prefix twins when `tail`).
    */
  private def duckCorpus(tail: Boolean): String = {
    val text = if (tail) "substr(text, 1, 10000) || ' planted tail'" else "text"
    s"""corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, $text AS text
       |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20))""".stripMargin
  }

  /** corpus(<id>, text) → ne(<id>, sh) and hbase(<id>, h): distinct
    * 3-gram shingles of whitespace tokens (empty-shingle rows dropped)
    * and their base hashes — the mirror of `tokenShingles(tokens(text),
    * 3)` + `filter(size > 0)` + `Md5P61.base`. Parameterized on the id
    * column so doc-level (q26/q50/q51) and group-level (q55) oracles
    * share ONE transliteration of the tokenizer.
    */
  private def duckShinglesFor(id: String): String =
    s"""toks AS (SELECT $id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM corpus),
       |grams AS (SELECT $id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(tk) - 2, 0)),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM toks),
       |ne AS MATERIALIZED (SELECT $id, sh FROM grams WHERE len(sh) > 0),
       |shingle AS (SELECT $id, md5(unnest(sh)) AS __mh FROM ne),
       |hbase AS (SELECT $id, """.stripMargin + Md5P61.duckBaseHex("__mh") + " AS h FROM shingle)"

  private val duckShingles: String = duckShinglesFor("doc_id")

  /** sigs(doc_id, sig) → bands(doc_id, band_id, band_key): the band
    * slices alone — shared verbatim by the full oracle and the staged
    * (signature-reading) sf10 variant, so the two can only diverge in
    * the upstream the stage replaces.
    */
  private def duckBandsCte(k: Int, bands: Int): String = {
    val rows = k / bands
    s"""bands AS MATERIALIZED (SELECT doc_id, band_id,
       |    list_slice(sig, band_id * $rows + 1, band_id * $rows + $rows) AS band_key
       |  FROM sigs CROSS JOIN range($bands) r(band_id))""".stripMargin
  }

  /** hbase(doc_id, h) → sigs(doc_id, sig) → bands(doc_id, band_id,
    * band_key): the k-family signature and its band slices.
    */
  private def duckSigBands(k: Int, bands: Int): String =
    s"""${Md5P61.duckFams(k)},
       |mins AS (SELECT b.doc_id, fm.f, min(${Md5P61.duckRehash("b.h")}) AS mn
       |  FROM hbase b CROSS JOIN fams fm GROUP BY b.doc_id, fm.f),
       |sigs AS MATERIALIZED (SELECT doc_id, list(mn ORDER BY f) AS sig FROM mins GROUP BY doc_id),
       |${duckBandsCte(k, bands)}""".stripMargin

  // ---- staged (sf10) oracle support ---------------------------------------
  //
  // The corpus→ne→sigs upstream is the one oracle fragment that is
  // intractable in DuckDB at sf10 (>20 min per query: 5x10^8 hugeint
  // rehashes through per-element lambdas, measured in both the cross-join
  // and in-row forms, vs ~20 s for the engine's native kernels). The
  // staged variants persist that upstream ONCE from the engine — the same
  // signature table a production deployment persists anyway — and the
  // oracle re-runs everything downstream of it (banding, bucket caps,
  // candidate joins, exact-Jaccard verification, transitive clustering).
  // See [[graft.StagedOracle]] for the trust argument.

  /** Persist (doc_id, sh, sig) for a doc-level minhash corpus variant —
    * the engine-kernel equivalent of the oracle's corpus→ne→sigs chain.
    * Idempotent per stage dir (q50 and q51 share one table).
    */
  private def stageDocSigs(tail: Boolean, table: String)(
      spark: SparkSession, sfDir: String, stageDir: String): Unit = {
    val dest = new java.io.File(stageDir, table)
    if (graft.StagedOracle.isFresh(dest, sfDir)) return
    val d = Tables.documents(spark, sfDir)
    val planted =
      if (tail) d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(substring(col("text"), 1, 10000), lit(" planted tail")).as("text"))
      else d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
    d.select(col("doc_id"), col("text")).unionByName(planted)
      .select(col("doc_id"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TextExprs.minhashSig(spark, col("sh"), 16, "md5"))
      .write.mode("overwrite").parquet(dest.getAbsolutePath)
    graft.StagedOracle.markComplete(dest, sfDir)
  }

  /** Staged replacements for the ne/sigs CTEs: both read the one persisted
    * signature table.
    */
  private def stagedNeSigs(table: String): String =
    s"""ne AS MATERIALIZED (SELECT doc_id, sh FROM read_parquet('{STAGE}/$table/*.parquet')),
       |sigs AS MATERIALIZED (SELECT doc_id, sig FROM read_parquet('{STAGE}/$table/*.parquet'))""".stripMargin

  /** corpus doc-id universe (planted ids included) without the text
    * column — the staged finals need only ids, and this keeps the doc
    * universe derived from the RAW table rather than the stage.
    */
  private val duckCorpusIds: String =
    s"""corpus AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id
       |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20))""".stripMargin

  /** Exact Jaccard of two shingle-list SQL expressions (mirror of
    * [[jaccard]]; same form as the q25 oracle).
    */
  private def duckJaccard(a: String, b: String): String =
    s"CASE WHEN len(list_distinct($a || $b)) = 0 THEN 0.0 " +
      s"ELSE CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct($a || $b)) END"

  /** corpus(doc_id, text) → sfp(doc_id, simhash64): the 60-bit md5-mode
    * SimHash (majority vote per bit over per-token base hashes).
    */
  private[text] val duckSimhash: String =
    s"""stoks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM corpus),
       |stok AS (SELECT doc_id, md5(unnest(tk)) AS __mh FROM stoks),
       |stn AS (SELECT doc_id, len(tk) AS n FROM stoks),
       |sth AS (SELECT doc_id, ${Md5P61.duckBaseHex("__mh")} AS h FROM stok),
       |svotes AS (SELECT doc_id, b, sum(CAST((h >> b) & 1 AS BIGINT)) AS v
       |  FROM sth CROSS JOIN range(60) r(b) GROUP BY doc_id, b),
       |sfp AS (SELECT v.doc_id,
       |    CAST(sum(CASE WHEN 2 * v.v >= t.n THEN CAST(1 AS BIGINT) << v.b
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash64
       |  FROM svotes v JOIN stn t ON t.doc_id = v.doc_id GROUP BY v.doc_id)""".stripMargin

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

  /** q136: the dedup SAVINGS report — duplicate-cluster size histogram
    * with the redundancy each size class carries (docs and chars that
    * dedup removes when one representative is kept per content hash).
    * The "was the dedup pass worth it" number every corpus card reports.
    *
    * Scale shape: the content groupBy is q20's one shuffle; the
    * histogram is a second aggregate over O(distinct contents) rows
    * keyed by cluster size — O(size classes) output. Redundant chars
    * per group = group char volume minus one copy (copies share one
    * text, so any copy's length is the kept length). All-BIGINT.
    */
  val qDedupReport = GraftQuery(
    "q136_dedup_report",
    (s, dir) => {
      // plant two extra copies of the first 10 docs (the q30 idiom) so
      // the histogram exercises multi-size classes on any corpus
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("text"), col("n_chars"))
      val planted = d.filter(col("doc_id") < 10)
      val corpus = d
        .unionByName(planted.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("n_chars")))
        .unionByName(planted.filter(col("doc_id") < 5)
          .select((col("doc_id") + 2000000).as("doc_id"),
            col("text"), col("n_chars")))
      val groups = corpus
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"),
          sum(col("n_chars")).as("chars_total"),
          max(col("n_chars")).as("chars_one"))
      groups.groupBy(col("n_copies").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_copies")).as("n_docs"),
          sum(col("n_copies") - 1).as("n_redundant_docs"),
          sum(col("chars_total") - col("chars_one")).as("redundant_chars"))
        .orderBy(col("cluster_size"))
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, n_chars FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 2000000, text, n_chars FROM documents WHERE doc_id < 5),
      groups AS (
        SELECT md5(text) AS text_hash, count(*) AS n_copies,
               sum(n_chars) AS chars_total, max(n_chars) AS chars_one
        FROM corpus GROUP BY md5(text))
      SELECT CAST(n_copies AS BIGINT) AS cluster_size,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(n_copies) AS BIGINT) AS n_docs,
             CAST(sum(n_copies - 1) AS BIGINT) AS n_redundant_docs,
             CAST(sum(chars_total - chars_one) AS BIGINT) AS redundant_chars
      FROM groups GROUP BY n_copies
      ORDER BY cluster_size"""))

  /** q148: per-source novelty KPI — how much of each source's volume is
    * actually new content vs exact re-crawls of text seen ANYWHERE in
    * the corpus (a doc is novel only if it is the minimum doc_id of its
    * corpus-wide content cluster). The ingest dashboard number that
    * catches a mirror site: high volume, near-zero novelty.
    *
    * Scale shape: the q20 content groupBy computes each cluster's
    * min-doc winner once; one slim (hash, winner) join back tags every
    * doc, then an O(sources) rollup. All-BIGINT; the rate divides exact
    * counts.
    */
  val qSourceNovelty = GraftQuery(
    "q148_source_novelty",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val winners = docs.groupBy(col("h")).agg(min(col("doc_id")).as("keep"))
      docs.join(winners, Seq("h"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("keep"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("source"), col("n_docs"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_docs").cast("double"))
            .as("novelty_rate"))
        .orderBy(col("source"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, source, md5(text) AS h FROM documents),
      winners AS (SELECT h, min(doc_id) AS keep FROM docs GROUP BY h)
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN d.doc_id = w.keep THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel,
             CAST(sum(CASE WHEN d.doc_id = w.keep THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty_rate
      FROM docs d JOIN winners w ON d.h = w.h
      GROUP BY d.source
      ORDER BY d.source"""))

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
      WITH toks AS MATERIALIZED (
        -- split ONCE per doc: re-evaluating regexp_split_to_array inside
        -- the lambda re-splits the whole text per gram index — O(tokens ×
        -- text_len) per doc, the round-15 maxlen-sweep hang class
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
      ), sh AS MATERIALIZED (
        SELECT doc_id, source,
          list_distinct(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
            i -> t[i] || ' ' || t[i+1])) AS grams
        FROM toks)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(list_distinct(a.grams || b.grams)) END AS jaccard
      FROM sh a JOIN sh b
        ON a.source = b.source AND b.doc_id = a.doc_id + 20
      ORDER BY doc_a"""))

  /** MinHash+LSH near-dup pairs in md5 hash mode — the full pipeline
    * (shingle → sign → band → bucket-join → verify) is transliterated to
    * DuckDB, so the driver hash-checks the ALGORITHM end to end.
    */
  /** q26 oracle downstream (everything after ne/sigs/bands) — one string,
    * shared verbatim by the full and staged variants.
    */
  private val q26Downstream: String = s"""
      capped AS MATERIALIZED (SELECT * FROM bands
        QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= 1000),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM capped a JOIN capped b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      scored AS (
        SELECT c.doc_a, c.doc_b,
          CAST(len(list_filter(generate_series(1, 16),
            i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 16.0 AS est_jaccard,
          ${duckJaccard("na.sh", "nb.sh")} AS jaccard
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.doc_a
        JOIN sigs sb ON sb.doc_id = c.doc_b
        JOIN ne na ON na.doc_id = c.doc_a
        JOIN ne nb ON nb.doc_id = c.doc_b)
      SELECT doc_a, doc_b, est_jaccard, jaccard
      FROM scored
      WHERE jaccard >= 0.3
      ORDER BY doc_a, doc_b"""

  val qMinhash = GraftQuery(
    "q26_minhash_lsh_dedup",
    (s, dir) => {
      // Plant near-duplicates so the operator has work to do at any SF:
      // the 20 lowest-doc_id docs get a 95%-prefix twin.
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(substring(col("text"), 1, 10000), lit(" planted tail")).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      minhashDupPairs(corpus, threshold = 0.3, hashMode = "md5")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH ${duckCorpus(tail = true)},
      $duckShingles,
      ${duckSigBands(16, 4)},$q26Downstream"""),
    staged = Some(graft.StagedOracle(
      stageDocSigs(tail = true, "minhash_sigs_tail.parquet"),
      s"""
      WITH ${stagedNeSigs("minhash_sigs_tail.parquet")},
      ${duckBandsCte(16, 4)},$q26Downstream""")))

  val qSimhash = GraftQuery(
    "q27_simhash",
    (s, dir) =>
      // sort before the hash projection: the range exchange samples only
      // the scan, and the fingerprint is computed exactly once per doc
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          TextExprs.simhash64(s, TextAnalysis.tokens(col("text")), "md5")
            .as("simhash64")),
    Some(s"""
      WITH corpus AS (SELECT doc_id, text FROM documents),
      $duckSimhash
      SELECT doc_id, simhash64 FROM sfp ORDER BY doc_id"""))

  /** Canonical-assignment dedup over documents + planted duplicates:
    * one output row per doc (the scale-safe dedup shape). md5 hash mode →
    * the bucket-min / candidate-min / verify pipeline has a real oracle.
    */
  /** q50 oracle downstream, shared by the full and staged variants. */
  private val q50Downstream: String = s"""
      bmin AS (SELECT band_id, band_key, min(doc_id) AS bucket_min
        FROM bands GROUP BY band_id, band_key),
      cand AS (
        SELECT b.doc_id, min(m.bucket_min) AS cand
        FROM bands b JOIN bmin m
          ON b.band_id = m.band_id AND b.band_key = m.band_key
        GROUP BY b.doc_id
        HAVING min(m.bucket_min) < b.doc_id),
      ver AS (
        SELECT c.doc_id, c.cand
        FROM cand c
        JOIN ne da ON da.doc_id = c.doc_id
        JOIN ne db ON db.doc_id = c.cand
        WHERE ${duckJaccard("da.sh", "db.sh")} >= 0.5)
      SELECT c.doc_id,
             coalesce(v.cand, c.doc_id) AS canonical_id,
             v.cand IS NULL AS is_canonical
      FROM corpus c LEFT JOIN ver v ON v.doc_id = c.doc_id
      ORDER BY c.doc_id"""

  val qMinhashCanonical = GraftQuery(
    "q50_minhash_canonical",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
      minhashCanonical(d.select(col("doc_id"), col("text")).unionByName(planted),
        threshold = 0.5, hashMode = "md5")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${duckCorpus(tail = false)},
      $duckShingles,
      ${duckSigBands(16, 4)},$q50Downstream"""),
    staged = Some(graft.StagedOracle(
      stageDocSigs(tail = false, "minhash_sigs_copies.parquet"),
      s"""
      WITH $duckCorpusIds,
      ${stagedNeSigs("minhash_sigs_copies.parquet")},
      ${duckBandsCte(16, 4)},$q50Downstream""")))

  /** Transitive dedup clusters over documents + planted duplicates:
    * exercises the connected-components path. The oracle computes true
    * components via a recursive transitive closure over the same verified
    * star-edge graph — feasible at oracle scale, and it independently
    * proves the alternating-star algorithm labels every node with its
    * component minimum.
    */
  /** q51 oracle downstream, shared by the full and staged variants. */
  private val q51Downstream: String = s"""
      bmin AS (SELECT band_id, band_key, min(doc_id) AS dst
        FROM bands GROUP BY band_id, band_key),
      star AS (
        SELECT DISTINCT b.doc_id AS src, m.dst
        FROM bands b JOIN bmin m
          ON b.band_id = m.band_id AND b.band_key = m.band_key
        WHERE b.doc_id <> m.dst),
      ver AS MATERIALIZED (
        SELECT s.src, s.dst FROM star s
        JOIN ne na ON na.doc_id = s.src
        JOIN ne nb ON nb.doc_id = s.dst
        WHERE ${duckJaccard("na.sh", "nb.sh")} >= 0.5),
      sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM ver
              UNION SELECT dst AS u, src AS v FROM ver),
      reach AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u),
      labels AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u)
      SELECT c.doc_id,
             CASE WHEN l.mn IS NULL OR l.mn > c.doc_id THEN c.doc_id
                  ELSE l.mn END AS cluster_id,
             (l.mn IS NULL OR l.mn > c.doc_id) AS is_canonical
      FROM corpus c LEFT JOIN labels l ON l.doc_id = c.doc_id
      ORDER BY c.doc_id"""

  val qDedupClusters = GraftQuery(
    "q51_dedup_clusters",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
      minhashClusters(d.select(col("doc_id"), col("text")).unionByName(planted),
        threshold = 0.5, hashMode = "md5")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${duckCorpus(tail = false)},
      $duckShingles,
      ${duckSigBands(16, 4)},$q51Downstream"""),
    staged = Some(graft.StagedOracle(
      stageDocSigs(tail = false, "minhash_sigs_copies.parquet"),
      s"""
      WITH RECURSIVE $duckCorpusIds,
      ${stagedNeSigs("minhash_sigs_copies.parquet")},
      ${duckBandsCte(16, 4)},$q51Downstream""")))

  /** SimHash near-duplicate pairs: band the 64-bit fingerprint into
    * `bands` equal slices — by pigeonhole, two fingerprints within
    * Hamming distance `bands − 1` share at least one identical band — and
    * bucket-join on (band_id, band_value), then verify the true bit
    * distance. Same LSH-blocking shape (and hot-bucket cap) as MinHash,
    * but candidate generation is pure integer arithmetic on an 8-byte
    * fingerprint: the shuffle carries (band_id, int16, doc_id, int64).
    */
  def simhashDupPairs(docs: DataFrame, maxHamming: Int = 3,
                      maxBucketSize: Int = 1000,
                      hashMode: String = "xx"): DataFrame = {
    val spark = docs.sparkSession
    // pigeonhole completeness needs MORE bands than differing bits: with
    // maxHamming flipped bits and maxHamming+1 bands, at least one band is
    // untouched — a hard-coded band count would silently lose recall for
    // any larger maxHamming. Band b covers bits [b·W/bands, (b+1)·W/bands)
    // (W = fingerprint width: 64 for xx, 60 for md5) — integer-divided
    // boundaries distribute the W bits exactly, so every band is non-empty
    // and in range for bands ≤ W (a fixed width of ceil(W/bands) would
    // push the last band past bit W-1 for many band counts, producing a
    // degenerate constant-zero band).
    val fpBits = TextExprs.simhashBits(hashMode)
    val fp = docs
      .select(col("doc_id").as("id"),
        TextExprs.simhash64(spark, TextAnalysis.tokens(col("text")), hashMode).as("fp"))
    bandedHammingPairs(fp, fpBits, maxHamming, maxBucketSize,
      "simhashDupPairs", "doc_a", "doc_b")
  }

  /** The fingerprint-agnostic half of [[simhashDupPairs]]: pigeonhole
    * band-blocking + bucket-join + exact hamming verify over ANY 64-bit-or-
    * narrower fingerprint column (SimHash, image dHash, …). Input schema is
    * (id, fp); output (outA, outB, hamming) with outA < outB. Shuffles only
    * (band_id, int16, id, int64) rows; hot buckets capped like MinHash.
    */
  private[graft] def bandedHammingPairs(fp: DataFrame, fpBits: Int,
      maxHamming: Int, maxBucketSize: Int, opName: String,
      outA: String, outB: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming < fpBits,
      s"maxHamming must be in [0, $fpBits), got $maxHamming")
    val bands = maxHamming + 1
    def mask(bits: Int): Long = if (bits >= 64) -1L else (1L << bits) - 1
    val bandedAll = fp.select(col("id"), col("fp"),
      explode(array((0 until bands).map { b =>
        val lo = b * fpBits / bands
        val hi = (b + 1) * fpBits / bands
        struct(lit(b).as("band_id"),
          shiftright(col("fp"), lo)
            .bitwiseAND(lit(mask(hi - lo))).as("band_val"))
      }: _*)).as("band"))
      .select(col("id"), col("fp"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
    val banded = capBuckets(bandedAll, Seq("band_id", "band_val"),
      maxBucketSize, opName)
    banded.as("a").join(banded.as("b"), Seq("band_id", "band_val"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as(outA), col("b.id").as(outB),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col(outA), col(outB), col("hamming"))
  }

  /** SimHash dedup pairs over documents + planted exact twins (hamming 0).
    * The oracle replicates the ENGINE's plan — band split, hot-bucket cap,
    * bucket self-join, hamming verify — band boundaries generated from the
    * same integer-division formula as [[simhashDupPairs]]. By pigeonhole
    * the banded candidate set contains every hamming ≤ 3 pair (bands =
    * maxHamming+1), so the hash match doubles as a completeness proof.
    */
  val qSimhashDedup = GraftQuery(
    "q52_simhash_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text"))
      simhashDupPairs(d.select(col("doc_id"), col("text")).unionByName(planted),
        hashMode = "md5")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val fpBits = TextExprs.simhashBits("md5")
      val bands = 3 + 1 // maxHamming + 1, matching the Spark default
      val bandDefs = (0 until bands).map { b =>
        val lo = b * fpBits / bands
        val hi = (b + 1) * fpBits / bands
        s"SELECT $b AS band_id, $lo AS lo, ${(1L << (hi - lo)) - 1} AS mask"
      }.mkString(" UNION ALL ")
      s"""
      WITH ${duckCorpus(tail = false)},
      $duckSimhash,
      bdef AS ($bandDefs),
      sbands AS (
        SELECT f.doc_id, f.simhash64 AS fp, d.band_id,
               (f.simhash64 >> d.lo) & d.mask AS band_val
        FROM sfp f CROSS JOIN bdef d),
      scapped AS (SELECT * FROM sbands
        QUALIFY count(*) OVER (PARTITION BY band_id, band_val) <= 1000),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.fp AS fp_a, b.fp AS fp_b
        FROM scapped a JOIN scapped b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
        WHERE a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
      FROM pairs
      WHERE bit_count(xor(fp_a, fp_b)) <= 3
      ORDER BY doc_a, doc_b"""
    })

  /** Inter-GROUP similarity via the custom MinHashSketch aggregate: one
    * k-long sketch per source (partial aggregation merges buffers, the
    * shuffle carries one sketch per group per partition — never documents
    * or shingles), then pairwise sketch agreement estimates the Jaccard
    * similarity between each pair of sources' shingle-set UNIONS.
    * Rows-only (xxhash64-based); semantics pinned by the differential
    * spec against the posexplode/groupBy reference form.
    */
  val qSourceSketch = GraftQuery(
    "q55_source_sketch",
    (s, dir) => {
      val k = 64
      // filter empty-shingle docs BEFORE signing (as every dedup path
      // does): an empty set's signature is all Long.MaxValue sentinels,
      // and two all-sentinel sketches would report est_jaccard = 1.0 for
      // completely disjoint (empty) sources
      val sigs = Tables.documents(s, dir)
        .select(col("source"),
          TextExprs.tokenShingles(s, TextAnalysis.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("source"), TextExprs.minhashSig(s, col("sh"), k, "md5").as("sig"))
      val sketches = sigs.groupBy(col("source"))
        .agg(TextExprs.minhashSketchAgg(col("sig"), k).as("sketch"))
      val a = sketches.select(col("source").as("source_a"), col("sketch").as("sk_a"))
      val b = sketches.select(col("source").as("source_b"), col("sketch").as("sk_b"))
      a.join(b, col("source_a") < col("source_b"))
        .withColumn("est_jaccard", estJaccard(col("sk_a"), col("sk_b"), k))
        .select(col("source_a"), col("source_b"), col("est_jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    // The sketch aggregate's position-wise min over per-doc signatures
    // equals, per (source, family), the min over every shingle of every
    // doc in the source — so the oracle skips the per-doc stage entirely
    // and min-aggregates the rehash by (source, family) directly.
    Some(s"""
      WITH corpus AS (SELECT source, text FROM documents),
      ${duckShinglesFor("source")},
      ${Md5P61.duckFams(64)},
      smins AS MATERIALIZED (SELECT b.source, fm.f, min(${Md5P61.duckRehash("b.h")}) AS mn
        FROM hbase b CROSS JOIN fams fm GROUP BY b.source, fm.f)$q55Final"""),
    // q55's substance IS the signature build (the compare over 64-row
    // sketches is trivial), so its stage point is the per-(source, family)
    // signature itself: the engine's sketch aggregate, position-exploded.
    staged = Some(graft.StagedOracle(
      stageSourceSmins("minhash_smins_by_source.parquet"),
      s"""
      WITH smins AS MATERIALIZED (
        SELECT source, f, mn
        FROM read_parquet('{STAGE}/minhash_smins_by_source.parquet/*.parquet'))$q55Final""")))

  /** q55 oracle final select, shared by the full and staged variants. */
  private def q55Final: String = """
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS DOUBLE) / 64.0
               AS est_jaccard
      FROM smins a JOIN smins b ON a.f = b.f AND a.source < b.source
      GROUP BY a.source, b.source
      ORDER BY source_a, source_b"""

  /** Persist the per-(source, family) minhash signature — the engine's
    * q55 sketch aggregate, position-exploded to the oracle's smins shape.
    */
  private def stageSourceSmins(table: String)(
      spark: SparkSession, sfDir: String, stageDir: String): Unit = {
    val dest = new java.io.File(stageDir, table)
    if (graft.StagedOracle.isFresh(dest, sfDir)) return
    val k = 64
    val sigs = Tables.documents(spark, sfDir)
      .select(col("source"),
        TextExprs.tokenShingles(spark, TextAnalysis.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("source"), TextExprs.minhashSig(spark, col("sh"), k, "md5").as("sig"))
    sigs.groupBy(col("source"))
      .agg(TextExprs.minhashSketchAgg(col("sig"), k).as("sketch"))
      .select(col("source"), posexplode(col("sketch")).as(Seq("f", "mn")))
      .write.mode("overwrite").parquet(dest.getAbsolutePath)
    graft.StagedOracle.markComplete(dest, sfDir)
  }

  /** Exact substring-level dedup (the cross-document repeated-substring
    * pass from "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022 — their suffix-array ExactSubstr step): emit, per
    * document, the maximal token spans [span_start, span_end) in which
    * every token is covered by some minTokens-window that occurs in at
    * least `minDocs` distinct documents (the connected union of duplicated
    * windows — interior windows bridging two merged duplicated windows
    * need not themselves be duplicated).
    * Doc-level dedup (MinHash/SimHash above) misses boilerplate shared by
    * otherwise-different documents; this finds the shared regions
    * themselves so a curation pipeline can cut them.
    *
    * Distributed shape — a suffix array on the driver is the classic
    * single-node approach and is exactly what does NOT scale:
    *  1. one pass computes rolling window-hashes per position
    *     ([[TextExprs.GramWindowHashes]] — O(tokens), no gram strings);
    *  2. the shuffle key is the 8-byte window hash with (doc_id, pos)
    *     payload — O(tokens) rows of 3 scalars, never text, never pairs;
    *  3. "shared across >= minDocs docs" is a count-distinct aggregate per
    *     hash followed by a left-semi join back (both sides shuffle on the
    *     same hash key; hot boilerplate grams cost one aggregate row, not
    *     an occurrence blow-up);
    *  4. marked positions merge into maximal spans per doc with one
    *     windowed pass (gap > minTokens starts a new span — windows at
    *     distance <= minTokens cover a contiguous token range).
    * The docs scan runs twice (once per side of the semi-join) — at scale
    * that beats materializing O(tokens) marked positions, and Spark
    * prunes both scans to (doc_id, text).
    */
  def substringDupSpans(spark: SparkSession, docs: DataFrame, minTokens: Int,
                        minDocs: Int = 2): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= minTokens)
    val grams = toks.select(col("doc_id"),
        posexplode(TextExprs.gramWindowHashes(spark, col("toks"), minTokens))
          .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("g"))
      // pin the gram rows on the hash key ONCE: the duplicate-gram
      // aggregate clusters by g (subset of its (g, doc) keys) and BOTH
      // semi-join sides then read this same exchange (ReusedExchange) —
      // previously the plan shuffled the O(tokens) gram rows twice (once
      // by (g, doc) for the distinct count, once by g for the semi-join)
      // and ran the docs scan + rolling-hash kernel once per side
      .repartition(spark.sessionState.conf.numShufflePartitions, col("g"))
    // "shared by >= 2 distinct docs" ⟺ min(doc) != max(doc): exact, and
    // one aggregation level where count_distinct plans two (dedup then
    // count), each with its own exchange
    val dup =
      if (minDocs == 2)
        grams.groupBy(col("g"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select(col("g"))
      else
        grams.groupBy(col("g"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs)
          .select(col("g"))
    val marked = grams.join(dup, Seq("g"), "left_semi")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= minTokens, lit(0))
          .otherwise(lit(1))) // lag NULL on the first row → otherwise → 1
      .withColumn("span_id", sum(col("new_span")).over(byPos))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + minTokens).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** q61: substring-level dedup over `documents` at minTokens=4 (small
    * corpus, small vocabulary — 4-grams recur across docs; production
    * corpora use ~50, Lee et al. §3). The oracle recomputes the full
    * pipeline on gram STRINGS (DuckDB has no xxhash64) — hash-collision-free
    * by construction, so it also certifies the rolling-hash kernel's
    * collision behavior on this corpus.
    */
  val qSubstringDedup = GraftQuery(
    "q61_substring_dedup",
    (s, dir) => substringDupSpans(s, Tables.documents(s, dir), minTokens = 4),
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 4
      ), words AS (
        -- zipped unnest + window lead, NOT a per-position slice of the
        -- captured token list: list_transform(generate_series, i -> t[i:i+3])
        -- re-materializes the whole list per element, O(tokens^2) per doc —
        -- the round-15 maxlen sweep (190 KB docs) hung the oracle on it
        SELECT doc_id,
               unnest(generate_series(1, len(t))) - 1 AS pos,
               unnest(t) AS tok
        FROM toks
      ), grams AS (
        SELECT doc_id, pos,
               tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w || ' ' || lead(tok, 3) OVER w AS gram
        FROM words
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(tok, 3) OVER w IS NOT NULL
      ), dup AS (
        SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
      ), marked AS (
        SELECT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM dup)
      ), sids AS (
        SELECT doc_id, pos,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        FROM (SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
                     THEN 0 ELSE 1 END AS new_span
              FROM marked) x
      )
      SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
             max(pos) + 4 - min(pos) AS span_tokens
      FROM sids GROUP BY doc_id, span_id
      ORDER BY doc_id, span_start"""))

  /** Cut the duplicated spans found by [[substringDupSpans]] OUT of the
    * text — the second half of the Lee et al. ExactSubstr story (finding
    * spans is a report; a curation pipeline needs the cleaned corpus).
    * Returns every input document as (doc_id, clean_text,
    * n_tokens_removed): clean_text is the whitespace-normalized join of
    * the tokens outside every duplicated span (possibly empty), including
    * docs with no spans (n_tokens_removed = 0).
    *
    * Distributed shape: spans come back KEYED BY doc_id from the span
    * finder, so the cut is one per-doc aggregation of the span list
    * (bounded by n_tokens/minTokens spans per doc), one equi-join onto
    * the tokenized docs (slim span side; AQE broadcasts it when small),
    * and a narrow index-filter over the token array — no new shuffle
    * shape beyond q61's, and text crosses the wire at most once.
    */
  def removeDupSpans(spark: SparkSession, docs: DataFrame, minTokens: Int,
                     minDocs: Int = 2): DataFrame = {
    // sort_array: collect_list order is partition-arrival order; the gap
    // arithmetic below needs spans ascending by span_start
    val spans = substringDupSpans(spark, docs, minTokens, minDocs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("spans"))
    // typed empty array so the no-span branch keeps EVERYTHING (a bare
    // null would null out the gap arithmetic → clean_text null)
    val noSpans = array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    // Spans are disjoint maximal intervals (consecutive spans satisfy
    // next.span_start > prev.span_end — the finder merges anything at gap
    // <= minTokens), so the kept tokens are exactly the gap slices between
    // them: [0, s1.start), [s1.end, s2.start), ..., [sk.end, n_toks).
    // Per-doc cost is O(tokens + spans): the lambdas below run once per
    // SPAN (interpreted, but the array is short), and the token-volume
    // work (slice / flatten / concat_ws) is native — unlike the previous
    // per-token filter(exists(spans)) scan, an interpreted
    // O(tokens x spans) loop per document.
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"), noSpans))
      .withColumn("gap_starts",
        concat(array(lit(1L)),
          transform(col("spans"), sp => sp.getField("span_end") + lit(1L))))
      .withColumn("gap_ends",
        concat(transform(col("spans"), sp => sp.getField("span_start")),
          array(size(col("toks")).cast("long"))))
      .withColumn("kept",
        flatten(zip_with(col("gap_starts"), col("gap_ends"), (s, e) =>
          slice(col("toks"), s.cast("int"), greatest(e - s + lit(1L), lit(0L)).cast("int")))))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_tokens_removed"))
      .orderBy(col("doc_id"))
  }

  /** q70: the cleaned corpus for q61's spans. The oracle independently
    * recomputes the span table on gram strings (the q61 transliteration)
    * and reassembles each document from the positions outside every span
    * — an end-to-end check that the cut matches the report.
    */
  val qRemoveSpans = GraftQuery(
    "q70_substring_removal",
    (s, dir) => removeDupSpans(s, Tables.documents(s, dir), minTokens = 4),
    Some("""
      WITH toksall AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
      ), toks AS (
        SELECT doc_id, t FROM toksall WHERE len(t) >= 4
      ), words AS (
        -- linear zipped unnest (see q61's oracle note on the quadratic
        -- per-position slice this replaces)
        SELECT doc_id,
               unnest(generate_series(1, len(t))) - 1 AS pos,
               unnest(t) AS tok
        FROM toks
      ), grams AS (
        SELECT doc_id, pos,
               tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w || ' ' || lead(tok, 3) OVER w AS gram
        FROM words
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(tok, 3) OVER w IS NOT NULL
      ), dup AS (
        SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
      ), marked AS (
        SELECT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM dup)
      ), sids AS (
        SELECT doc_id, pos,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        FROM (SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
                     THEN 0 ELSE 1 END AS new_span
              FROM marked) x
      ), spans AS (
        SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
        FROM sids GROUP BY doc_id, span_id
      ), pos AS (
        SELECT doc_id,
               unnest(generate_series(1, len(t))) - 1 AS pos,
               unnest(t) AS tok
        FROM toksall
      ), kept AS (
        SELECT p.doc_id, p.pos, p.tok FROM pos p
        WHERE NOT EXISTS (SELECT 1 FROM spans sp
          WHERE sp.doc_id = p.doc_id AND p.pos >= sp.s AND p.pos < sp.e)
      ), ka AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
               count(*) AS nk
        FROM kept GROUP BY doc_id
      )
      SELECT ta.doc_id AS doc_id, coalesce(ka.clean_text, '') AS clean_text,
             CAST(len(ta.t) - coalesce(ka.nk, 0) AS BIGINT) AS n_tokens_removed
      FROM toksall ta LEFT JOIN ka ON ta.doc_id = ka.doc_id
      ORDER BY doc_id"""))

  /** q84: containment vs Jaccard on planted contained docs — the 20
    * lowest-id docs get a half-prefix twin; every 2-shingle of a contiguous
    * prefix appears in the full doc, so containment is exactly 1.0 while
    * Jaccard stays well below — the pair a similarity threshold misses.
    */
  val qContainment = GraftQuery(
    "q84_containment",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val toks = TextAnalysis.tokens(col("text"))
      val planted = d.orderBy(col("doc_id")).limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1),
          greatest((size(toks) / 2).cast("int"), lit(1)))).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      def sh2 = TextExprs.tokenShingles(s, TextAnalysis.tokens(col("text")), 2)
      val a = corpus.select(col("doc_id").as("doc_a"), sh2.as("sh_a"))
      val b = corpus.select(col("doc_id").as("doc_b"), sh2.as("sh_b"))
      a.join(b, col("doc_a") === col("doc_b") + 1000000)
        .select(col("doc_a"), col("doc_b"),
          containment(col("sh_a"), col("sh_b")).as("containment"),
          jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .orderBy(col("doc_a"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      pl AS (
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
        FROM (SELECT doc_id, t FROM toks ORDER BY doc_id LIMIT 20)),
      corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM pl),
      sh AS MATERIALIZED (
        -- split once per doc (see q25's oracle note)
        SELECT doc_id,
          list_distinct(list_transform(generate_series(1, greatest(len(ct) - 1, 0)),
            i -> ct[i] || ' ' || ct[i+1])) AS grams
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS ct
              FROM corpus) c)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CASE WHEN len(a.grams) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(a.grams) END AS containment,
        CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                / len(list_distinct(a.grams || b.grams)) END AS jaccard
      FROM sh a JOIN sh b ON a.doc_id = b.doc_id + 1000000
      ORDER BY doc_a"""))

  val queries: Seq[GraftQuery] =
    Seq(qExactDedup, qNgramJaccard, qMinhash, qSimhash, qMinhashCanonical,
      qDedupClusters, qSimhashDedup, qSourceSketch, qSubstringDedup,
      qRemoveSpans, qContainment, qDedupReport, qSourceNovelty)
}
