package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** Registry-wide degenerate-input robustness: every query must return a
  * result — never throw — when every table has zero rows, exactly one
  * row, exactly two rows (the n−1 = 1 boundary of every sample-statistic
  * denominator and 2-point interpolation), one row duplicated 100×
  * (zero-entropy hot-key data), ten rows of nothing but NULLs (nulls in
  * every column are a fact of life in any at-scale corpus; typed-Dataset
  * decodes of primitive fields are the crash class), ~190 KB
  * max-length document strings (the crawl-page shape), or a
  * unicode/multibyte-heavy corpus (CJK/emoji/NFD/RTL — the codepoint
  * semantics shape).
  *
  * Why these are first-class properties and not edge cases: at scale,
  * scheduled jobs routinely see inputs that prune to almost nothing (a
  * partition filter on a day with no data, a shard with one record, a
  * filter cascade that removes everything) — and a GROUP inside a huge
  * table hits the same degeneracies (one member, zero variance, a zero
  * marginal, one dominant key) long before the table does. "Crash on
  * degenerate" turns a normal morning into a paged incident.
  *
  * The sweeps that motivated this spec found 21 real defects, all
  * crashes, none semantic: empty input broke q29/q38 query-row selection,
  * q111's argmax over an empty pool, and q117's null SUM decode;
  * single-row input divided by zero in nine statistics/binning queries
  * (zero range in q12/q99, n−1 = 0 or zero variance in
  * q36/q121/q163/q76/q165, zero marginals in q125, zero positives in
  * q175); all-duplicate input presented N copies of the q29 query row
  * and tripped its multi-query guard; all-null input crashed seven
  * typed-Dataset decodes (MediaAsset, the IVF build tuple, the
  * streaming Event/doc rows) on NULL-into-primitive fields. Each now has
  * defined semantics (NULL statistic / bucket 0 / empty result /
  * drop-undecodable-at-the-boundary) MIRRORED in its DuckDB oracle —
  * the degenerate outputs are hash-checked cross-engine, not just
  * no-throw (verified on the single-row fixture via scripts/compare.py).
  *
  * Fixtures preserve schema by limiting the real sf0.001 parquet, so
  * schema-dependent plumbing (column resolution, encoders, casts) is
  * still exercised.
  */
class EmptyInputSpec extends SparkSpec {

  private def fixture(rows: Int, dup: Int = 1): String = {
    val dir = Files.createTempDirectory(s"graft_sf_limit${rows}x$dup").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    Tables.AllNames.foreach { t =>
      val one = spark.read.parquet(s"$src/$t.parquet").limit(rows)
      val rep = if (dup == 1) one
        else one.crossJoin(spark.range(dup).select(org.apache.spark.sql.functions.lit(1).as("__r")))
          .drop("__r")
      rep.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }
  private lazy val emptyDir: String = fixture(0)
  private lazy val oneRowDir: String = fixture(1)
  private lazy val twoRowDir: String = fixture(2)
  private lazy val dupDir: String = fixture(1, dup = 100)
  private lazy val nullDir: String = {
    val dir = Files.createTempDirectory("graft_sf_nulls").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    Tables.AllNames.foreach { t =>
      val base = spark.read.parquet(s"$src/$t.parquet").limit(10)
      base.select(base.schema.fields.map(f =>
          org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)): _*)
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  // Max-length strings (the crawl-page shape, VERDICT r14 item 3):
  // documents.text ~150-190 KB per doc — even doc_ids share one identical
  // highly repetitive text (a planted exact-dup cluster with giant
  // duplicate spans), odd doc_ids unique repetitive text. Stresses the
  // tokenize/shingle/BPE/fingerprint/substring-dedup kernels on long
  // inputs; every kernel must stay per-byte linear (no catastrophic regex
  // backtracking, no length-quadratic pass). Same construction as
  // scripts/make_boundary_fixtures.py, whose fixture is additionally
  // hash-checked cross-engine via scripts/compare.py (SCALE.md round 15).
  private lazy val maxLenDir: String = {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sf_maxlen").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    val sharedPhrase = "the quick brown fox jumps over the lazy dog while " +
      "the cat watches quietly from the warm windowsill nearby "
    Tables.AllNames.foreach { t =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (t == "documents")
          base.orderBy("doc_id").limit(12)
            .withColumn("text",
              when(col("doc_id") % 2 === 0,
                concat(repeat(lit(sharedPhrase), 1800), lit("shared-tail")))
                .otherwise(concat(repeat(concat(lit("unique phrase "),
                  col("doc_id").cast("string"),
                  lit(" with assorted words chosen to vary the shingle stream ")),
                  2500), col("doc_id").cast("string"))))
            .withColumn("n_chars", length(col("text")).cast("long"))
        else base.limit(12)
      out.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  // Unicode/multibyte-heavy corpus (round-16 shape 7, VERDICT r15 item 4):
  // CJK, ZWJ-family emoji + skin tones + flags (astral → surrogate pairs
  // in UTF-16 engines), NFD combining diacritics, RTL Arabic/Hebrew,
  // Greek/Cyrillic — the byte-vs-codepoint-vs-grapheme position semantics
  // every text kernel silently assumes away on ASCII fixtures. Same
  // construction as scripts/make_boundary_fixtures.py fix_unicode, whose
  // fixture is hash-checked cross-engine via scripts/compare.py (found
  // the learnMergesLocal split("") lone-surrogate bug; SCALE.md r16).
  private lazy val unicodeDir: String = {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_sf_unicode").toFile
    dir.deleteOnExit()
    val src = "/root/testdata/sf0.001"
    val templates = Seq(
      "機械学習のモデル 自然言語処理",
      "数据库系统 查询优化与索引",
      "data pipeline 🚀 with 👨‍👩‍👧 and 🧑🏽‍💻 flags 🇵🇱",
      "café résumé naïve dejà vu combining marks",
      "معالجة اللغة الطبيعية",
      "עיבוד שפה טבעית",
      "Αλγόριθμοι Алгоритмы")
    val shared = templates.mkString(" ") + " shared tail"
    Tables.AllNames.foreach { t =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (t == "documents") {
          val tplArr = array(templates.map(lit): _*)
          base.orderBy("doc_id").limit(40)
            .withColumn("text",
              when(col("doc_id") % 10 === 0, lit(shared))
                .otherwise(concat(
                  lit("doc "), col("doc_id").cast("string"), lit(" begins here "),
                  element_at(tplArr, (col("doc_id") % templates.size).cast("int") + 1),
                  lit(" and mixes in "),
                  element_at(tplArr, ((col("doc_id") * 3 + 1) % templates.size).cast("int") + 1),
                  lit(" unique marker "), col("doc_id").cast("string"))))
            .withColumn("n_chars", length(col("text")).cast("long"))
        } else base.limit(40)
      out.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  private def sweep(shape: String, dir: () => String,
                    fn: (org.apache.spark.sql.SparkSession, String) => DataFrame,
                    name: String): Unit =
    test(s"$name is $shape-input safe") {
      // count() forces full execution; the assertion is "no throw" — the
      // row count itself is query-specific (most are 0 or 1;
      // constant-output shapes like corpus cards may emit summary rows).
      // The VALUES on these shapes are additionally oracle-pinned via the
      // compare.py runs documented above.
      fn(spark, dir()).count()
    }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    sweep("empty", () => emptyDir, fn, name)
    sweep("single-row", () => oneRowDir, fn, name)
    sweep("two-row", () => twoRowDir, fn, name)
    sweep("all-duplicate", () => dupDir, fn, name)
    sweep("all-null", () => nullDir, fn, name)
    sweep("max-length-string", () => maxLenDir, fn, name)
    sweep("unicode-multibyte", () => unicodeDir, fn, name)
  }
}
