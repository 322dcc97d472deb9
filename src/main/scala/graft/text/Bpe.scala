package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Real byte-pair-encoding tokenization: LEARN the merge table from the
  * corpus (iterative most-frequent-adjacent-pair aggregation, the Sennrich
  * et al. 2016 algorithm), then APPLY the learned merges as a narrow
  * expression chain. Upgrades the q35 "BPE-ish regex" token counter to a
  * tokenizer whose vocabulary actually comes from the data.
  *
  * Representation: a word's segmentation is ONE string of
  * delimiter-wrapped symbols, `\u0001sym\u0002` concatenated — so "ab" is
  * `\u0001a\u0002\u0001b\u0002`. That encoding makes both halves of BPE a
  * plain literal string `replace`:
  *  - applying merge (a,b)→ab is `replace(seg, "\u0001a\u0002\u0001b\u0002",
  *    "\u0001ab\u0002")`, and the engine-standard replace semantics
  *    (left-to-right, non-overlapping, scan continues after the
  *    replacement) are exactly BPE's greedy leftmost merge;
  *  - the lexicographic tie-break on the encoded pair string equals the
  *    (sym_a, sym_b) tuple tie-break, because the \u0002 terminator sorts
  *    below every text character (prefix symbols compare shorter-first).
  * Both properties hold identically in Spark and DuckDB, which is what
  * makes the learner ORACLE-ABLE: the oracle unrolls the k learning rounds
  * as generated CTE stages and must reproduce the exact merge sequence to
  * hash-match.
  *
  * At 100 TB:
  *  - learning runs over the DISTINCT-WORD frequency table (one
  *    O(tokens) shuffle to build; Zipf-bounded vocabulary afterwards);
  *    each round shuffles (pair, count) scalars — O(vocab · avg word
  *    length) rows — and collects exactly ONE row (the argmax), the same
  *    bounded-collect contract as IVF training;
  *  - rounds are cached and the previous round unpersisted, so lineage
  *    stays O(1) per round;
  *  - applying is a narrow per-row expression chain (k literal replaces,
  *    codegen-friendly), no shuffle at all.
  */
object Bpe {

  private val SOH = "\u0001" // symbol start
  private val STX = "\u0002" // symbol end

  /** Encode a word column into the delimited segmentation string (one
    * symbol per character).
    */
  private def encodeWord(word: Column): Column =
    regexp_replace(word, "(.)", s"$SOH$$1$STX")

  /** Adjacent symbol pairs of a segmentation string, each re-encoded as a
    * delimited 2-symbol string (the merge SEARCH pattern).
    */
  private def adjacentPairs(seg: Column): Column = {
    val syms = regexp_extract_all(seg, lit(s"$SOH([^$STX]*)$STX"), lit(1))
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(syms) - 2),
        i => concat(lit(SOH), element_at(syms, i + 1), lit(STX),
          lit(SOH), element_at(syms, i + 2), lit(STX))))
  }

  /** Learn up to `k` merges from the corpus. Returns (search, replacement)
    * encoded-string pairs IN MERGE ORDER; stops early when no adjacent
    * pair remains. Deterministic: argmax by (count DESC, encoded pair
    * ASC) — binary string order in both engines.
    */
  def learnMerges(docs: DataFrame, k: Int): Seq[(String, String)] = {
    require(k >= 1, s"learnMerges k must be >= 1, got $k")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(encodeWord(col("word")).as("seg"), col("cnt"))
      .cache()
    cur.count()
    var done = false
    while (merges.size < k && !done) {
      val top = cur.select(col("cnt"), explode(adjacentPairs(col("seg"))).as("pr"))
        .groupBy(col("pr")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pat = top(0).getString(0)
        val rep = pat.replace(STX + SOH, "") // \1a\2\1b\2 -> \1ab\2
        merges += ((pat, rep))
        val next = cur
          .select(call_function("replace", col("seg"), lit(pat), lit(rep)).as("seg"),
            col("cnt"))
          .cache()
        next.count()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Exact BPE learning over an in-memory (word, count) table — the loop
    * [[learnMergesCapped]] runs after its bounded collect. Semantics are
    * IDENTICAL to the distributed [[learnMerges]] (same weighting, same
    * greedy leftmost merge, same (count DESC, encoded pair ASC)
    * tie-break); BpeSpec pins the equivalence differentially.
    */
  def learnMergesLocal(wordCounts: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    require(k >= 1, s"learnMergesLocal k must be >= 1, got $k")
    // Split into CODE POINTS, not String.split("")'s UTF-16 code units:
    // split("") halves astral characters (emoji, rare CJK) into lone
    // surrogates, which diverges from the regexp '(.)' per-codepoint
    // symbols of the distributed path and the DuckDB oracle — and a lone
    // surrogate doesn't even survive the UTF-8 merge-cache round-trip
    // (encoded as '?'). Found by the round-16 unicode corpus sweep.
    var words = wordCounts.map { case (w, c) =>
      (w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp))), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.size - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        def enc(p: (String, String)) = SOH + p._1 + STX + SOH + p._2 + STX
        val best = counts.toSeq.minBy { case (p, c) => (-c, enc(p)) }._1
        merges += ((enc(best), SOH + best._1 + best._2 + STX))
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2 // greedy leftmost, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
    }
    merges.toSeq
  }

  /** The scale path for learning: ONE distributed word-count shuffle
    * (O(tokens), the only corpus-scale pass), a BOUNDED TakeOrdered
    * collect of the top-`vocabCap` words by (count DESC, word ASC) — the
    * standard trainer practice; the Zipf tail it drops carries negligible
    * pair mass — then the exact local loop. Turns k rounds of cluster
    * jobs into one, which is why the registry query uses it; the fully
    * distributed [[learnMerges]] remains the unbounded-vocabulary option.
    */
  def learnMergesCapped(docs: DataFrame, k: Int,
                        vocabCap: Int = 65536): Seq[(String, String)] = {
    require(vocabCap >= 1, s"learnMergesCapped vocabCap must be >= 1, got $vocabCap")
    val wc = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnMergesLocal(wc.toSeq, k)
  }

  /** Merge table learned ONCE per corpus fingerprint and persisted —
    * the [[graft.vector.IvfIndex.ensurePersisted]] pattern applied to the
    * tokenizer: a real system trains BPE offline and every downstream job
    * applies the frozen merge table; re-learning per query re-pays the
    * corpus word-count shuffle each time (q72 and q135 both learn the
    * SAME table). The table is k (search, replacement) string pairs — a
    * tiny TSV keyed by [[Tables.corpusFingerprint]], so a regenerated
    * corpus retrains and a warm one is reused across queries AND JVMs
    * (Verify, Bench, tests). Symbols cannot contain the separators: words
    * come from whitespace tokenization, so tab/newline never appear in a
    * symbol. The training corpus is derived from `dir` INTERNALLY (the
    * quantity the cache is keyed by) — callers cannot accidentally pass a
    * filtered frame and silently receive the full-corpus table. A cache
    * row missing its tab separator marks a corrupted file: it is deleted
    * and the table relearned.
    */
  def mergesFor(spark: org.apache.spark.sql.SparkSession, dir: String,
                k: Int = MergeRounds): Seq[(String, String)] = synchronized {
    val fp = Tables.corpusFingerprint(s"$dir/documents.parquet")
    val f = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_bpe_${fp}_$k.tsv")
    val cached: Option[Seq[(String, String)]] =
      if (!java.nio.file.Files.exists(f)) None
      else {
        import scala.jdk.CollectionConverters._
        val rows = java.nio.file.Files
          .readAllLines(f, java.nio.charset.StandardCharsets.UTF_8)
          .asScala.toSeq.filter(_.nonEmpty).map(_.split("\t", 2))
        // a row without the tab separator means a corrupted cache file:
        // discard it and relearn instead of crashing the caller
        if (rows.nonEmpty && rows.forall(_.length == 2))
          Some(rows.map { case Array(pat, rep) => (pat, rep) })
        else { java.nio.file.Files.deleteIfExists(f); None }
      }
    cached.getOrElse {
      val merges = learnMergesCapped(Tables.documents(spark, dir), k)
      val tmp = java.nio.file.Files.createTempFile(f.getParent, "graft_bpe_", ".tmp")
      java.nio.file.Files.write(tmp,
        merges.map { case (p, r) => s"$p\t$r" }.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // atomic publish — a concurrent JVM sees either nothing or the
      // complete table, never a half-written file
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      merges
    }
  }

  /** Apply learned merges to a segmentation column: the narrow k-deep
    * literal replace chain.
    */
  def applyMerges(seg: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(seg) { case (c, (pat, rep)) =>
      call_function("replace", c, lit(pat), lit(rep))
    }

  /** Per-document token accounting under the learned tokenizer:
    * (doc_id, n_words, n_bpe_tokens). A document's BPE token count is the
    * number of symbol delimiters left after the merge chain, summed over
    * its words.
    */
  def bpeTokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val wordTokens = transform(TextAnalysis.tokens(col("text")),
      w => applyMerges(encodeWord(w), merges))
    docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"),
      aggregate(wordTokens, lit(0L), (acc, s) =>
        acc + (length(s) - length(call_function("replace", s, lit(SOH), lit(""))))
          .cast("long")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The k learning stages, unrolled as generated DuckDB CTEs: stage r
    * extracts adjacent pairs from w{r}, argmaxes with the identical
    * (count DESC, pair ASC) tie-break, and rewrites segmentations into
    * w{r+1}. chr(3) is a never-matching sentinel so exhausted rounds
    * (no pairs left) no-op instead of nulling the corpus. AS MATERIALIZED
    * is load-bearing: every w{r} is referenced twice, so default CTE
    * inlining would expand the chain into 2^k scans of the parquet
    * (observed as a file-handle explosion at k=16).
    */
  private def duckStages(k: Int): String = (0 until k).map { r =>
    s"""p$r AS MATERIALIZED (SELECT pr, sum(cnt) AS c FROM (
        SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
          i -> chr(1) || syms[i] || chr(2) || chr(1) || syms[i+1] || chr(2))) AS pr
        FROM (SELECT cnt, regexp_extract_all(seg,
                chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1) AS syms
              FROM w$r) s$r) g$r
        GROUP BY pr),
      b$r AS MATERIALIZED (SELECT pr FROM p$r ORDER BY c DESC, pr LIMIT 1),
      w${r + 1} AS MATERIALIZED (SELECT cnt, replace(seg,
          coalesce((SELECT pr FROM b$r), chr(3)),
          coalesce(replace((SELECT pr FROM b$r), chr(2) || chr(1), ''), chr(3)))
          AS seg FROM w$r)"""
  }.mkString(",\n")

  private def duckApplyChain(k: Int): String =
    (0 until k).foldLeft("seg") { (acc, r) =>
      s"""replace($acc, coalesce((SELECT pr FROM b$r), chr(3)),
          coalesce(replace((SELECT pr FROM b$r), chr(2) || chr(1), ''), chr(3)))"""
    }

  /** 16 merges keeps the learning loop (and the oracle's unrolled CTE
    * chain) cheap while exercising multi-level merges — merged symbols
    * re-merging with neighbors.
    */
  val MergeRounds = 16

  val qBpe = GraftQuery(
    "q72_bpe_tokenize",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      bpeTokenCounts(docs, mergesFor(s, dir))
    },
    Some(s"""
      WITH wf AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                  FROM documents),
      w0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seg,
                    count(*) AS cnt
             FROM wf GROUP BY 1),
      ${duckStages(MergeRounds)},
      docw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
               FROM documents),
      wordsr AS (SELECT doc_id, unnest(words) AS w FROM docw),
      encr AS (SELECT doc_id,
                      regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seg
               FROM wordsr),
      finr AS (SELECT doc_id, ${duckApplyChain(MergeRounds)} AS seg FROM encr),
      cnts AS (SELECT doc_id,
                      CAST(sum(len(seg) - len(replace(seg, chr(1), ''))) AS BIGINT)
                        AS n_bpe_tokens
               FROM finr GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.words) AS BIGINT) AS n_words, c.n_bpe_tokens
      FROM docw d JOIN cnts c ON d.doc_id = c.doc_id
      ORDER BY d.doc_id"""))

  /** q135: tokenizer fertility per language — BPE tokens per word under
    * the learned merge chain, the tokenizer-evaluation number a
    * multilingual training recipe budgets by (a language with fertility
    * 2× pays 2× the sequence length for the same text). Same learned
    * tokenizer as q72; the extra work is one lang join + O(langs)
    * aggregate, and every ratio divides exact BIGINT sums.
    */
  val qFertility = GraftQuery(
    "q135_tokenizer_fertility",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val perDoc = bpeTokenCounts(docs, mergesFor(s, dir))
      perDoc.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe_tokens"),
          (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
            .as("fertility"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH wf AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                  FROM documents),
      w0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seg,
                    count(*) AS cnt
             FROM wf GROUP BY 1),
      ${duckStages(MergeRounds)},
      docw AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS words
               FROM documents),
      wordsr AS (SELECT doc_id, unnest(words) AS w FROM docw),
      encr AS (SELECT doc_id,
                      regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seg
               FROM wordsr),
      finr AS (SELECT doc_id, ${duckApplyChain(MergeRounds)} AS seg FROM encr),
      cnts AS (SELECT doc_id,
                      CAST(sum(len(seg) - len(replace(seg, chr(1), ''))) AS BIGINT)
                        AS n_bpe_tokens
               FROM finr GROUP BY doc_id)
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(d.words)) AS BIGINT) AS n_words,
             CAST(sum(c.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
             CAST(sum(c.n_bpe_tokens) AS DOUBLE) / CAST(sum(len(d.words)) AS DOUBLE)
               AS fertility
      FROM docw d JOIN cnts c ON d.doc_id = c.doc_id
      GROUP BY d.lang
      ORDER BY d.lang"""))

  val queries: Seq[GraftQuery] = Seq(qBpe, qFertility)
}
