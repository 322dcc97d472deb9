#!/usr/bin/env python3
"""Reduce a SPARK_GRAFT_STREAM_METRICS jsonl into the SCALE.md state-growth
table: one row per (query, state operator) with state rows / memory /
commit time across batches, plus a growth verdict (flat / linear-in-keys /
linear-in-run). Queries with multiple stateful operators (e.g. both sides
of a stream-stream join) get one row EACH — no operator is hidden.

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


def growth_verdict(n0, n1, nbatches):
    # n0 == 0 (operator starts empty) would make any growth register as
    # "linear-in-run" under a ratio test — fall back to the second
    # batch's count as the base, or call it flat if it stays at zero.
    if n0 == 0:
        if n1 == 0:
            return "flat"
        n0 = 1  # degenerate base: report growth vs 1 but flag it
    if n1 <= n0 * 1.5:
        return "flat"
    if nbatches >= 2 and n1 >= n0 * (nbatches * 0.6):
        return "linear-in-run"
    return "sublinear"


print("| query | operator | batches | rows/batch | state rows first->last "
      "| rows evicted | state MB first->last | commit ms (median) | growth |")
print("|---|---|---|---|---|---|---|---|---|")
for name, rows in per.items():
    rows.sort(key=lambda d: d["batchId"])
    nops = max((len(r["stateOperators"]) for r in rows), default=0)
    if nops == 0:
        print(f"| {name} | — | {len(rows)} | {rows[0]['numInputRows']} "
              f"| stateless | — | — | — | — |")
        continue
    for i in range(nops):
        sts = [r["stateOperators"][i] for r in rows
               if len(r["stateOperators"]) > i]
        if not sts:
            continue
        first, last = sts[0], sts[-1]
        commits = sorted(s["commitTimeMs"] for s in sts)
        med = commits[len(commits) // 2]
        n0, n1 = first["numRowsTotal"], last["numRowsTotal"]
        growth = growth_verdict(n0, n1, len(sts))
        removed = sum(s.get("numRowsRemoved", 0) for s in sts)
        op = (first.get("operator") or f"op{i}") or f"op{i}"
        mb = lambda s: round(s["memoryUsedBytes"] / 1e6, 1)
        print(f"| {name} | {op} | {len(rows)} | {rows[0]['numInputRows']} | "
              f"{n0} -> {n1} | {removed} | {mb(first)} -> {mb(last)} | "
              f"{med} | {growth} |")
