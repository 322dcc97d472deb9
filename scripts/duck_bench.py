#!/usr/bin/env python3
"""DuckDB-side benchmark over the SAME oracle SQL the correctness gate runs.

Usage: python3 scripts/duck_bench.py <sfDir> <oracleSqlJson> [runs=3] [outJson]

[outJson] additionally writes the newline-terminated committed-artifact
form (one key per line) — e.g. duck_bench_out.json.

<oracleSqlJson> is the oracle_sql.json that `graft.Verify` dumps — e.g.

    scripts/run.sh graft.Verify /root/testdata/sf0.1 /tmp/v
    python3 scripts/duck_bench.py /root/testdata/sf0.1 /tmp/v/oracle_sql.json

Times every oracle query (min over `runs`, first run discarded as warmup
when runs > 1) against <sfDir>'s parquet tables and prints ONE JSON line
mirroring graft.Bench's shape, so bench_vs_baseline is reproducible by any
session: Spark total (BENCH_r*.json) / this total = the ratio the judge
gates on. Run both in the same hour on an idle box — totals on this
machine swing with driver load.
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, runs=3):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    times, errs = {}, {}
    for name in sorted(oracle):
        best = None
        try:
            for r in range(max(1, runs)):
                t0 = time.monotonic()
                con.execute(oracle[name]).fetchall()
                dt = time.monotonic() - t0
                if r == 0 and runs > 1:
                    continue  # warmup
                best = dt if best is None else min(best, dt)
        except Exception as e:
            errs[name] = str(e).split("\n")[0]
            continue
        times[name] = round(best, 4)
    out = {
        "metric": "duckdb_oracle_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "runs": runs,
        "errors": errs,
    }
    print(json.dumps(out))
    # committed artifact form: one key per line (reviewable diffs) and a
    # terminating newline so the file never dirties future diffs
    if len(sys.argv) > 4:
        with open(sys.argv[4], "w") as f:
            f.write(json.dumps(out, indent=0))
            f.write("\n")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 3))
