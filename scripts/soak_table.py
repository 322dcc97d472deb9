#!/usr/bin/env python3
"""Reduce a SPARK_GRAFT_STREAM_METRICS jsonl into the SCALE.md state-growth
table: one row per (query, batch) with state rows / memory / commit time,
plus a per-query growth verdict (flat / linear-in-keys / linear-in-run).

Usage: python3 scripts/soak_table.py tmp/soak_metrics.jsonl
"""
import json, sys
from collections import defaultdict

per = defaultdict(list)
for line in open(sys.argv[1]):
    d = json.loads(line)
    name = d["query"]
    # strip the uuid suffix some queryNames carry
    parts = name.split("_")
    if len(parts) > 2 and len(parts[-1]) == 32:
        name = "_".join(parts[:-1])
    per[name].append(d)

print("| query | batches | rows/batch | state rows first->last | state MB first->last | commit ms (median) | growth |")
print("|---|---|---|---|---|---|---|")
for name, rows in per.items():
    rows.sort(key=lambda d: d["batchId"])
    sts = [r["stateOperators"][0] if r["stateOperators"] else None for r in rows]
    sts = [s for s in sts if s]
    if not sts:
        print(f"| {name} | {len(rows)} | {rows[0]['numInputRows']} | stateless | — | — | — |")
        continue
    first, last = sts[0], sts[-1]
    commits = sorted(s["commitTimeMs"] for s in sts)
    med = commits[len(commits) // 2]
    n0, n1 = first["numRowsTotal"], last["numRowsTotal"]
    growth = ("flat" if n1 <= n0 * 1.5 else
              "linear-in-run" if n1 >= n0 * (len(sts) * 0.6) else
              "sublinear")
    mb = lambda s: round(s["memoryUsedBytes"] / 1e6, 1)
    print(f"| {name} | {len(rows)} | {rows[0]['numInputRows']} | "
          f"{n0} -> {n1} | {mb(first)} -> {mb(last)} | {med} | {growth} |")
