#!/usr/bin/env python3
"""Per-query DuckDB oracle timing probe (triage companion to compare.py).

Usage: python3 scripts/probe_oracles.py <verifyOutDir> <sfDir> [thresholdSec]

Runs every oracle SQL from <verifyOutDir>/oracle_sql.json against <sfDir>'s
tables and prints each query that takes longer than the threshold (default
2 s), flushing as it goes — compare.py's output is block-buffered under
redirection, so a pathological oracle (e.g. the round-15 quadratic
list-slice lambda at max-length strings) looks like a silent hang there.
"""
import duckdb, json, os, time, sys

outdir, sfdir = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
sql = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
con.execute("SET threads=32; SET memory_limit='60GB'; "
            "SET temp_directory='/tmp/duck_spill'")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    try:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    except Exception:
        pass
for q in sorted(sql):
    t0 = time.time()
    try:
        con.execute(f"CREATE OR REPLACE TABLE r AS ({sql[q]})")
        n = con.execute("SELECT count(*) FROM r").fetchone()[0]
        dt = time.time() - t0
        if dt > thresh:
            print(f"{q}: {dt:.1f}s rows={n}", flush=True)
    except Exception as e:
        print(f"{q}: ERR {time.time()-t0:.1f}s {str(e)[:100]}", flush=True)
print("probe done", flush=True)
