#!/bin/bash
# Part N (session 6): waits for part M's pid ($1), then re-runs the two
# compensated-tpu stages with the HTTP-413 fix (packs passed as jit
# ARGUMENTS instead of closure captures), and finishes with a fresh
# bench.py headline row. Same deadline discipline as part M.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE (epoch seconds)}
if [ $# -ge 1 ] && [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
    local name=$1 cap=$2; shift 2
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt 900 ] && { echo "=== $name SKIPPED (deadline, ${left}s left)"; return 1; }
    [ "$left" -gt "$cap" ] && left=$cap
    echo "=== $name start (timeout ${left}s) $(date -u +%H:%M:%S) ==="
    timeout "$left" "$@" >> "bench_logs/r05n_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
    git commit -q -m "r05 TPU evidence: ${name} (rc=$rc)" || true
    return 0
}

run comp_triq_lja 5400 python tools/bench_compensated_tpu.py \
    --method triquintic --grid lja
run comp_tric_lja 3600 python tools/bench_compensated_tpu.py \
    --method tricubic --grid lja
run headline 3600 python bench.py
echo "=== part N done $(date -u +%H:%M:%S) ==="
