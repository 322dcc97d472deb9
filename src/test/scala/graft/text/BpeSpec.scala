package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def show(s: String): String =
    s.replace("", "<").replace("", ">")

  test("merge order: frequency argmax, lexicographic tie-break, early stop") {
    // word freqs: ab:4, abc:2, cd:2. Round 0: (a,b)=6 wins. Round 1:
    // (ab,c)=2 ties (c,d)=2 — encoded '<ab><c>' < '<c><d>', so the merged
    // symbol wins the tie. Round 2: (c,d). Round 3: every word is one
    // symbol — early stop at 3 merges despite k=5.
    val docs = Seq((0L, "ab ab ab"), (1L, "abc abc"), (2L, "ab cd cd"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 5)
    assert(merges.map(m => (show(m._1), show(m._2))) == Seq(
      ("<a><b>", "<ab>"), ("<ab><c>", "<abc>"), ("<c><d>", "<cd>")))

    val counts = Bpe.bpeTokenCounts(docs, merges)
      .as[(Long, Long, Long)].collect().toSeq
    // every word collapses to a single learned token
    assert(counts == Seq((0L, 3L, 3L), (1L, 2L, 2L), (2L, 3L, 3L)))

    // a PREFIX of the merge table segments coarser: only (a,b) applied
    // leaves abc as [ab, c] and cd as [c, d]
    val partial = Bpe.bpeTokenCounts(docs, merges.take(1))
      .as[(Long, Long, Long)].collect().toSeq
    assert(partial == Seq((0L, 3L, 3L), (1L, 2L, 4L), (2L, 3L, 5L)))
  }

  test("greedy leftmost, non-overlapping: merged symbols re-merge upward") {
    // 'aaa': round 0 learns (a,a) -> [aa, a] (leftmost pair merges, the
    // merged symbol does NOT cascade within the same round); round 1
    // learns (aa, a) -> [aaa]
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 5)
    assert(merges.map(m => show(m._1)) == Seq("<a><a>", "<aa><a>"))
    assert(Bpe.bpeTokenCounts(docs, merges.take(1))
      .as[(Long, Long, Long)].collect().toSeq == Seq((0L, 2L, 4L)))
    assert(Bpe.bpeTokenCounts(docs, merges)
      .as[(Long, Long, Long)].collect().toSeq == Seq((0L, 2L, 2L)))
    intercept[IllegalArgumentException] { Bpe.learnMerges(docs, 0) }
  }

  test("capped local learner is equivalent to the distributed learner") {
    // a corpus with ties, multi-level merges, and singleton words; an
    // uncapped vocab makes the two paths semantically identical — the
    // differential pin for using the capped path in the registry query
    val docs = Seq(
      (0L, "ab ab ab abc abc"), (1L, "cd cd xyz aaa"),
      (2L, "abcd w aaa aaa")).toDF("doc_id", "text")
    val dist = Bpe.learnMerges(docs, 6)
    val local = Bpe.learnMergesCapped(docs, 6)
    assert(local == dist)
    // the cap keeps only the top words — with cap=1 just the most
    // frequent word trains the vocabulary
    val capped = Bpe.learnMergesCapped(docs, 2, vocabCap = 1)
    assert(capped.map(m => show(m._1)) == Seq("<a><a>", "<aa><a>"))
    // equivalence must hold on ASTRAL characters too: the local learner's
    // old String.split("") halved emoji into UTF-16 lone surrogates while
    // the distributed path (regexp '(.)') and the DuckDB oracle split by
    // codepoints — the r16 unicode-sweep bug. The ZWJ-family emoji below
    // needs surrogate-pair-aware symbol splitting to round-trip at all.
    val uniDocs = Seq(
      (0L, "🚀x 🚀x data 👨‍👩 data"),
      (1L, "café café café 🚀x")).toDF("doc_id", "text")
    val uniDist = Bpe.learnMerges(uniDocs, 4)
    val uniLocal = Bpe.learnMergesCapped(uniDocs, 4)
    assert(uniLocal == uniDist, "astral/combining-char merge divergence")
    // and every learned symbol is a well-formed string (no lone surrogate)
    uniLocal.foreach { case (p, r) =>
      assert(!p.exists(Character.isSurrogate) ||
        p.codePoints().toArray.forall(Character.isValidCodePoint),
        s"lone surrogate in merge pattern")
      assert(new String((p + r).getBytes("UTF-8"), "UTF-8") == p + r,
        "merge does not survive the UTF-8 cache round-trip")
    }
  }

  test("persisted merge table: cold learn == warm reload, keyed by corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val fp = graft.Tables.corpusFingerprint(s"$dir/documents.parquet")
    val f = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_bpe_${fp}_${Bpe.MergeRounds}.tsv")
    java.nio.file.Files.deleteIfExists(f)
    val cold = Bpe.mergesFor(spark, dir) // learns + persists
    assert(java.nio.file.Files.exists(f), "merge table not persisted")
    val warm = Bpe.mergesFor(spark, dir) // must hit the file, not relearn
    assert(warm == cold)
    assert(cold == Bpe.learnMergesCapped(docs, Bpe.MergeRounds))
    // a corrupted cache row (no tab separator) must trigger relearn +
    // repair, not a MatchError
    java.nio.file.Files.writeString(f, "corrupted-line-without-tab")
    val healed = Bpe.mergesFor(spark, dir)
    assert(healed == cold)
    assert(java.nio.file.Files.readString(f).contains("\t"),
      "cache file not repaired after corruption")
  }

  test("tokenizer fertility aggregates q72's per-doc counts by language") {
    val out = Bpe.qFertility.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (lang, nDocs, nWords, nBpe, fert) =>
      assert(nDocs > 0 && nWords > 0, lang)
      // each word is at least one BPE token; merges only ever reduce
      assert(nBpe >= nWords, lang)
      assert(fert == nBpe.toDouble / nWords.toDouble, lang)
    }
    // totals must agree with the per-doc q72 surface under the same merges
    val perDoc = Bpe.qBpe.run(spark, "/root/testdata/sf0.001")
      .agg(org.apache.spark.sql.functions.sum("n_words"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .as[(Long, Long)].collect().head
    assert(out.map(_._3).sum == perDoc._1)
    assert(out.map(_._4).sum == perDoc._2)
  }
}
