#!/usr/bin/env python3
"""Build the round-14 extreme-numerics sweep fixtures (reproducible).

Usage: python3 scripts/make_extreme_fixtures.py [srcDir] [outRoot]

Creates two schema-preserving copies of the source scale dir:

  <outRoot>/fix_extreme   every DOUBLE measure column poisoned at fixed
                          row positions (mod 101): +inf, -inf, NaN,
                          1.5e308, -1.5e308, and the smallest denormal
  <outRoot>/fix_vecnan    embedding ELEMENTS poisoned at fixed positions
                          (mod 53): one NaN / +inf / -inf element

Sweep protocol (see SCALE.md round 14):
  scripts/run.sh graft.Verify <fixture> /tmp/v_x
  python3 scripts/compare.py <fixture> /tmp/v_x
Expected state on the round-14 engine: fix_vecnan is 199/199 hash-green
(the vector domain rule excludes corrupt vectors in both engines);
fix_extreme is ~155 pass with ~42 ANSI fail-fast rows — the DESIGNED
response to domain-violating money/measure magnitudes (do NOT paper
those over with try_add: a loud abort beats a silently poisoned
aggregate; quarantining corrupt measures is the ingest layer's job).
"""
import sys, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def make_extreme(con, src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{p}')")
        cols = con.execute("DESCRIBE t").fetchall()
        sel = []
        for c, ty, *_ in cols:
            if ty == "DOUBLE":
                sel.append(f"""CASE (row_number() OVER ()) % 101
                  WHEN 7 THEN 'inf'::DOUBLE WHEN 23 THEN '-inf'::DOUBLE
                  WHEN 41 THEN 'nan'::DOUBLE WHEN 59 THEN 1.5e308
                  WHEN 73 THEN -1.5e308 WHEN 89 THEN 4.9e-324
                  ELSE {c} END AS {c}""")
            else:
                sel.append(c)
        con.execute(f"COPY (SELECT {', '.join(sel)} FROM t) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")


def make_vecnan(con, src, dst):
    os.makedirs(dst, exist_ok=True)
    import shutil
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(f"""
      COPY (
        SELECT vec_id,
          CASE (row_number() OVER ()) % 53
            WHEN 7  THEN list_transform(range(1, len(embedding)+1), i -> CASE WHEN i = 3 THEN 'nan'::FLOAT ELSE embedding[i] END)
            WHEN 19 THEN list_transform(range(1, len(embedding)+1), i -> CASE WHEN i = 5 THEN 'inf'::FLOAT ELSE embedding[i] END)
            WHEN 31 THEN list_transform(range(1, len(embedding)+1), i -> CASE WHEN i = 9 THEN '-inf'::FLOAT ELSE embedding[i] END)
            ELSE embedding END AS embedding,
          * EXCLUDE (vec_id, embedding)
        FROM read_parquet('{src}/embeddings.parquet')
      ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    con = duckdb.connect()
    make_extreme(con, src, f"{out}/fix_extreme")
    make_vecnan(con, src, f"{out}/fix_vecnan")
    print(f"wrote {out}/fix_extreme and {out}/fix_vecnan from {src}")


if __name__ == "__main__":
    main()
