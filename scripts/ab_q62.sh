#!/bin/bash
# A/B a flagged sf10 row against the r16 checkout, same session (the
# q05/q01 protocol from round 17, applied to q62 per VERDICT r17 item 1):
# build the r16 tree in a worktree, then measure HEAD -> r16 -> HEAD
# back-to-back on the same box so any residual difference is code, not
# box state. The sandwich (HEAD twice) makes within-session drift
# visible in the artifact itself.
#
#   scripts/ab_q62.sh [query=q62_repetition_signals] [sfdir=tmp/sf10]
set -e
cd "$(dirname "$0")/.."
Q="${1:-q62_repetition_signals}"
SF="$(readlink -f "${2:-tmp/sf10}")"
WT=tmp/wt_r16
R16=ddd77e5

if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$R16"
fi
echo "[ab] compiling r16 worktree..."
(cd "$WT" && sbt -batch compile >/dev/null)

run() {  # run <dir> <out>
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$Q" \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_OUT="$2" SPARK_DRIVER_MEM=64g \
    scripts/run.sh graft.Bench 2>/dev/null | tail -1)
}
echo "[ab] HEAD pass 1..."
run . "/tmp/ab_${Q}_head1.json"
echo "[ab] r16 pass..."
run "$WT" "/tmp/ab_${Q}_r16.json"
echo "[ab] HEAD pass 2..."
run . "/tmp/ab_${Q}_head2.json"

python3 - "$Q" <<'EOF'
import json, sys
q = sys.argv[1]
def v(p):
    try:
        return json.load(open(p))["queries"].get(q)
    except Exception:
        return None
h1, r, h2 = (v(f"/tmp/ab_{q}_{t}.json") for t in ("head1", "r16", "head2"))
print(f"[ab] {q} sf10: HEAD={h1}s  r16={r}s  HEAD(again)={h2}s")
EOF
