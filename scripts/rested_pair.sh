#!/usr/bin/env bash
# Rested sf1 scaling pair (round-5 VERDICT item 8): rest the burstable host
# >= 9 minutes, then run the validation suite at local[N] and local[4N] in
# BOTH orders (rest again between orders), plus the pure-CPU ceiling pair.
# Results append to $SPARK_GRAFT_PAIR_LOG (default BENCH/rested_r07.log);
# BASELINE.md is updated manually from that log.
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${SPARK_GRAFT_SUITE_DOCS:-10000000}"
NLO="${SPARK_GRAFT_N:-2}"
NHI="${SPARK_GRAFT_4N:-8}"
REST="${SPARK_GRAFT_REST:-600}"
LOG="${SPARK_GRAFT_PAIR_LOG:-BENCH/rested_r07.log}"

run_suite() {  # $1 = cpus -> echoes docs/sec
  SPARK_GRAFT_CPUS="$1" SPARK_GRAFT_BENCH_MODE=suite SPARK_GRAFT_SUITE_DOCS="$DOCS" \
    SPARK_GRAFT_DETAIL_PATH=/tmp/bench_detail_pair.json \
    python bench.py 2>/dev/null | tail -1 \
    | python -c 'import json,sys; print(json.loads(sys.stdin.read())["suite_docs_per_sec"])'
}

echo "=== rested pair $(date -u +%FT%TZ) docs=$DOCS n=$NLO 4n=$NHI rest=${REST}s ===" >> "$LOG"

# pre-generate the docs table OUTSIDE any rested window (setup, not measured);
# detail goes to /tmp so the warmup can't clobber the round's BENCH/detail_r*.json
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_MODE=suite SPARK_GRAFT_SUITE_DOCS="$DOCS" \
  SPARK_GRAFT_DETAIL_PATH=/tmp/bench_detail_pair.json \
  python bench.py > /dev/null 2>&1 || true
echo "warmup+gen done $(date -u +%T)" >> "$LOG"

sleep "$REST"
a=$(run_suite "$NLO"); echo "lo-first local[$NLO]: $a docs/s" >> "$LOG"
sleep 20
b=$(run_suite "$NHI"); echo "lo-first local[$NHI]: $b docs/s" >> "$LOG"

sleep "$REST"
c=$(run_suite "$NHI"); echo "hi-first local[$NHI]: $c docs/s" >> "$LOG"
sleep 20
d=$(run_suite "$NLO"); echo "hi-first local[$NLO]: $d docs/s" >> "$LOG"

sleep 60
e=$(python scripts/cpu_ref.py "$NLO" 2>/dev/null | tail -1)
f=$(python scripts/cpu_ref.py "$NHI" 2>/dev/null | tail -1)
echo "cpu_ref local[$NLO]: $e  local[$NHI]: $f" >> "$LOG"

python - "$a" "$b" "$c" "$d" "$e" "$f" >> "$LOG" <<'EOF'
import sys
a, b, c, d, e, f = map(float, sys.argv[1:7])
print(f"lo-first speedup: {b/a:.2f}x  hi-first speedup: {c/d:.2f}x")
print(f"efficiency (of 4x): {b/a/4:.2f} / {c/d/4:.2f}")
print(f"cpu ceiling: {e/f:.2f}x (cpu_ref prints seconds; lower is faster)")
EOF
echo "=== done $(date -u +%FT%TZ) ===" >> "$LOG"
