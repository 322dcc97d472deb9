#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [--json <path>]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality. Reports per-query PASS/FAIL. Strict — if this passes, any
reasonable driver compare passes too.

--json <path>: also write a per-query map in the driver's CORRECTNESS
format ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) so gate artifacts built from this script carry
re-derivable per-row detail (VERDICT r17 item 5).
"""
import sys, os, json, glob
# eager-load every C extension BEFORE DuckDB maps its buffer pool: a
# spill-heavy oracle run can hold tens of thousands of mmaps, and a lazy
# .so load at fetchdf()/to_parquet() time then fails mprotect (observed at
# sf10 with the default vm.max_map_count)
import numpy as np
import pandas as pd
import pyarrow, pyarrow.parquet  # noqa: F401
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare: datetimes -> ns, ints -> int64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def connect(sf_dir):
    con = duckdb.connect()
    # let the oracle spill instead of OOM on large-SF runs: q68 at sf10
    # exhausts the default in-memory budget, and with only a temp_directory
    # (no explicit memory_limit) DuckDB still refused to spill the window
    # operator. The explicit 80GB limit + spill dir is the combination that
    # completed q68's oracle at sf10 (1,004,097 rows in ~40 s).
    # env overrides let a driver-external caller shard one big compare run
    # into parallel processes (each shard gets a slice of the budget);
    # defaults match the single-process driver gate
    con.execute(
        f"SET temp_directory='{os.environ.get('DUCK_SPILL', '/tmp/duck_spill')}'; "
        f"SET memory_limit='{os.environ.get('DUCK_MEM', '80GB')}'; "
        f"SET threads={os.environ.get('DUCK_THREADS', '32')};"
    )
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. ScaleUp output)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        try:
            # a directory with no part files (e.g. an interrupted ScaleUp)
            # raises at view bind time — skip the table like a missing
            # file instead of aborting the whole compare run
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        except Exception as e:
            print(f"WARNING: skipping table {t}: {e}")
    return con

def main(sf_dir, out_dir, json_out=None):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    per_query = {}

    def record(name, **kw):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        row.update(kw)
        per_query[name] = row

    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); n_fail += 1
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, err="no output")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY(EMPTY!)"
            print(f"{name}: {status} rows={len(spark_df)}")
            n_rowsonly += 1
            record(name, rows_match=len(spark_df) > 0,
                   spark_rows=len(spark_df), err=None if len(spark_df) else "empty")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            # an OOM can leave the shared connection's buffer pool in a
            # state where every later query also fails to allocate (the
            # sf10 q68→q87 collateral) — retry this query once on a
            # fresh connection before declaring the oracle failed.
            # Gate on allocation-type failures only: re-running genuinely
            # broken SQL doubles time-to-fail on large-SF runs.
            msg = str(e).lower()
            # match by exception TYPE first (an allocation failure phrased
            # without the substrings below must still get the retry), then
            # by message; IOException-class transients also get one retry —
            # only genuinely broken SQL (ParserException/BinderException/
            # ConversionException…) fails fast
            retryable = isinstance(
                e, (duckdb.OutOfMemoryException, duckdb.IOException,
                    duckdb.ConnectionException)
            ) or any(k in msg for k in ("memory", "allocat", "temp_directory",
                                        "could not allocate"))
            if not retryable:
                print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1
                record(name, spark_rows=len(spark_df), err=f"oracle: {e}")
                continue
            try:
                con = connect(sf_dir)
                duck_df = con.execute(oracle[name]).fetchdf()
            except Exception as e2:
                print(f"{name}: ORACLE SQL ERROR: {e2}"); n_fail += 1
                record(name, spark_rows=len(spark_df), err=f"oracle: {e2}")
                continue
        a, b = norm(spark_df), norm(duck_df)
        rows_ok = len(a) == len(b)
        schema_ok = list(a.columns) == list(b.columns)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"{name}: PASS rows={len(a)}")
            n_pass += 1
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(a), oracle_rows=len(b))
        except AssertionError as e:
            record(name, rows_match=rows_ok, schema_match=schema_ok,
                   hash_match=False, spark_rows=len(a), oracle_rows=len(b))
            print(f"{name}: FAIL rows spark={len(a)} duck={len(b)}")
            msg = str(e).split("\n")
            print("   " + "\n   ".join(msg[:12]))
            if len(a) == len(b) and list(a.columns) == list(b.columns):
                for c in a.columns:
                    col_a, col_b = a[c], b[c]
                    if col_a.dtype.kind == 'f':
                        neq = ~(np.isclose(col_a, col_b, rtol=0, atol=0, equal_nan=True))
                    else:
                        neq = ~((col_a == col_b) | (col_a.isna() & col_b.isna()))
                    neq = np.asarray(neq)
                    if neq.any():
                        i = int(np.argmax(neq))
                        print(f"   col {c}: {int(neq.sum())} diffs; first at row {i}: spark={col_a.iloc[i]!r} duck={col_b.iloc[i]!r}")
            n_fail += 1
    print(f"\nSUMMARY: {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(per_query, f, indent=1)
        print(f"per-query map -> {json_out} ({len(per_query)} entries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], json_out))
