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
    val cnt = size(toks) - (n - 1)
    // NB: Spark's sequence(1, 0) yields [1, 0] (descending), not empty —
    // guard short documents explicitly.
    val grams = when(cnt >= 1,
      transform(
        sequence(lit(1), cnt),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** MinHash signature: for each of k hash families, the minimum xxhash64
    * over the shingle set (seeded by the family index column).
    */
  def minhashSignature(shingleCol: Column, k: Int = 16): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleCol, sh => xxhash64(lit(i), sh)))
    }: _*)

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

  /** MinHash-LSH near-duplicate pairs over `documents`:
    * shingle → signature → band-bucket join → Jaccard verify ≥ threshold.
    * Returns (doc_a, doc_b, est_jaccard, jaccard).
    */
  def minhashDupPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sigs
      .select(col("doc_id"), col("sh"), col("sig"),
        explode(bandKeys(col("sig"), k, bands)).as("band"))
      .select(col("doc_id"), col("sh"), col("sig"),
        col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    val a = banded.select(
      col("band_id"), col("band_hash"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"), col("sig").as("sig_a"))
    val b = banded.select(
      col("band_id"), col("band_hash"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("sh_a"), col("sh_b"), col("sig_a"), col("sig_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / lit(k.toDouble))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
      .distinct()
  }

  /** 64-bit SimHash from token hashes: bit b of the fingerprint is set when
    * more token-hashes have bit b set than unset.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val n = size(hashes)
    val bitCols = (0 until 64).map { b =>
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)).cast("int"))
      when(ones * 2 >= n, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
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
      val a = d.select(col("doc_id").as("doc_a"), col("source"),
        shingles(col("text"), 2).as("sh_a"))
      val b = d.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
        shingles(col("text"), 2).as("sh_b"))
      a.join(b, col("source") === col("source_b") &&
          col("doc_b") === col("doc_a") + 20)
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
      val planted = d.limit(20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(substring(col("text"), 1, 10000), lit(" planted tail")).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      minhashDupPairs(corpus, threshold = 0.3).orderBy(col("doc_a"), col("doc_b"))
    },
    None)

  val qSimhash = GraftQuery(
    "q27_simhash",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), simhash(col("text")).as("simhash64"))
        .orderBy(col("doc_id")),
    None)

  val queries: Seq[GraftQuery] = Seq(qExactDedup, qNgramJaccard, qMinhash, qSimhash)
}
