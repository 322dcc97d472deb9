#!/usr/bin/env python3
"""Merge the three sf10 gate runs into one all-199 correctness artifact.

Usage: python3 scripts/merge_sf10_artifact.py <out.json> <log> [<log> ...]

Each log is a compare.py (or compare_sharded.sh shard) output containing
`name: PASS rows=N` / `name: FAIL ...` lines. Later logs win on name
collisions (re-runs supersede). The artifact records per-row status, row
count, and which log it came from — the provenance a reader needs to
re-derive any row.
"""
import sys, json, re, os

out, logs = sys.argv[1], sys.argv[2:]
rows = {}
for lg in logs:
    for line in open(lg, errors="replace"):
        m = re.match(r"^([a-z0-9_]+): (PASS|FAIL|ROWS-ONLY[^ ]*|NO OUTPUT|ORACLE SQL ERROR)"
                     r"(?:.*?rows[= ](?:spark=)?(\d+))?", line.strip())
        if m:
            rows[m.group(1)] = {
                "status": m.group(2),
                "rows": int(m.group(3)) if m.group(3) else None,
                "source_log": os.path.basename(lg),
            }
n_pass = sum(1 for r in rows.values() if r["status"] == "PASS")
art = {
    "scale": "sf10 (ScaleUp x100 of sf0.1, single pass, key-unique)",
    "n_queries": len(rows),
    "n_pass": n_pass,
    "n_fail": len(rows) - n_pass,
    "queries": dict(sorted(rows.items())),
}
json.dump(art, open(out, "w"), indent=1)
print(f"{out}: {len(rows)} rows, {n_pass} pass, {len(rows)-n_pass} fail")
