#!/usr/bin/env python3
"""Build the round-15 boundary-shape sweep fixtures (reproducible).

Usage: python3 scripts/make_boundary_fixtures.py [srcDir] [outRoot]

Creates two schema-preserving copies of the source scale dir:

  <outRoot>/fix_tworow   every table cut to exactly 2 rows (ordered by its
                         first column for reproducibility) — the n = 2
                         boundary of every n-1 denominator (sample stddev/
                         variance/correlation), quantile interpolation,
                         and 2-point binning/range path
  <outRoot>/fix_maxlen   documents.text replaced by ~100-200 KB strings
                         (the crawl-page shape): even doc_ids share one
                         identical highly-repetitive long text (a planted
                         exact-dup cluster with huge duplicate spans), odd
                         doc_ids get unique-per-doc repetitive text;
                         n_chars updated to match; 12 docs; every other
                         table cut to 12 rows so the sweep exercises the
                         tokenize/shingle/BPE/fingerprint kernels on long
                         inputs rather than bulk row count

Sweep protocol (mirrors make_extreme_fixtures.py / SCALE.md round 14):
  scripts/run.sh graft.Verify <fixture> /tmp/v_b
  python3 scripts/compare.py <fixture> /tmp/v_b
Expected state on the round-15 engine: both fixtures 199/199 hash-green.
The same two shapes are pinned registry-wide (no-throw + execution) in
EmptyInputSpec.
"""
import sys, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# even docs: one shared, highly repetitive ~190 KB text (exact-dup cluster
# with giant duplicate spans — the Lee-et-al substring-dedup stress);
# odd docs: per-doc repetitive ~150 KB text (unique shingle sets)
SHARED_PHRASE = ("the quick brown fox jumps over the lazy dog while the "
                 "cat watches quietly from the warm windowsill nearby ")
UNIQUE_PHRASE = " with assorted words chosen to vary the shingle stream "


def make_tworow(con, src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        first = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()[0][0]
        con.execute(f"""COPY (SELECT * FROM read_parquet('{p}')
                        ORDER BY {first} LIMIT 2)
                        TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")


def make_maxlen(con, src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        first = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()[0][0]
        if t == "documents":
            con.execute(f"""COPY (
              SELECT doc_id,
                CASE WHEN doc_id % 2 = 0
                  THEN repeat('{SHARED_PHRASE}', 1800) || 'shared-tail'
                  ELSE repeat('unique phrase ' || doc_id || '{UNIQUE_PHRASE}', 2500)
                       || doc_id
                END AS text,
                lang, source,
                len(CASE WHEN doc_id % 2 = 0
                  THEN repeat('{SHARED_PHRASE}', 1800) || 'shared-tail'
                  ELSE repeat('unique phrase ' || doc_id || '{UNIQUE_PHRASE}', 2500)
                       || doc_id END)::BIGINT AS n_chars
              FROM read_parquet('{p}') ORDER BY doc_id LIMIT 12)
              TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
        else:
            con.execute(f"""COPY (SELECT * FROM read_parquet('{p}')
                            ORDER BY {first} LIMIT 12)
                            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")


# --- round-16 shape 7: unicode/multibyte-heavy corpus ---------------------
# Every text kernel was only ever gated on ASCII-dominant fixtures;
# byte-vs-codepoint-vs-grapheme position semantics (substring, length,
# split, regex classes, casing) are a classic cross-engine divergence.
# Templates cover: CJK (no spaces inside runs), emoji incl. ZWJ families +
# skin-tone modifiers + flags (surrogate pairs in UTF-16 engines),
# combining diacritics (é as e+U+0301 — NFD, 2 codepoints 1 grapheme),
# RTL Arabic/Hebrew, Greek/Cyrillic, and Latin filler so tokenizers/
# stopword kernels still see words.
UNICODE_TEMPLATES = [
    "機械学習のモデルは大規模な計算資源を必要とする 自然言語処理と分散システム",
    "数据库系统在大规模数据处理中的查询优化与索引结构设计 分布式计算框架",
    "data pipeline \U0001F680 with emoji \U0001F468‍\U0001F469‍\U0001F467‍\U0001F466 clusters \U0001F9D1\U0001F3FD‍\U0001F4BB and flags \U0001F1F5\U0001F1F1 plus ✨\U0001F525\U0001F4BE",
    "café résumé naïve dejà vu combining marks",
    "معالجة اللغة الطبيعية وتعلم الآلة في الأنظمة الموزعة",
    "עיבוד שפה טבעית ולמידת מכונה במערכות מבוזרות",
    "Αλγόριθμοι και δομές δεδομένων Алгоритмы и структуры данных",
]


def make_unicode(con, src, dst):
    os.makedirs(dst, exist_ok=True)
    # shared exact-dup text for doc_id % 10 == 0 (a planted multibyte dup
    # cluster); everyone else cycles templates with a unique latin prefix
    shared = " ".join(UNICODE_TEMPLATES) + " shared tail"
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        first = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()[0][0]
        if t == "documents":
            rows = con.execute(
                f"SELECT doc_id, lang, source FROM read_parquet('{p}') "
                f"ORDER BY doc_id LIMIT 40").fetchall()
            recs = []
            for (doc_id, lang, source) in rows:
                if doc_id % 10 == 0:
                    text = shared
                else:
                    tpl = UNICODE_TEMPLATES[doc_id % len(UNICODE_TEMPLATES)]
                    text = (f"doc {doc_id} begins here {tpl} and mixes in "
                            f"{UNICODE_TEMPLATES[(doc_id * 3 + 1) % len(UNICODE_TEMPLATES)]}"
                            f" unique marker {doc_id}")
                recs.append((doc_id, text, lang, source, len(text)))
            con.execute("CREATE OR REPLACE TABLE _u(doc_id BIGINT, text VARCHAR,"
                        " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
            con.executemany("INSERT INTO _u VALUES (?,?,?,?,?)", recs)
            con.execute(f"COPY (SELECT * FROM _u ORDER BY doc_id) TO "
                        f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
        else:
            con.execute(f"""COPY (SELECT * FROM read_parquet('{p}')
                            ORDER BY {first} LIMIT 40)
                            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    con = duckdb.connect()
    make_tworow(con, src, f"{out}/fix_tworow")
    make_maxlen(con, src, f"{out}/fix_maxlen")
    make_unicode(con, src, f"{out}/fix_unicode")
    print(f"wrote {out}/fix_tworow, {out}/fix_maxlen and {out}/fix_unicode from {src}")


if __name__ == "__main__":
    main()
