#!/bin/bash
# Part R (session 11, post fourth machine restart): the 07:41 UTC restart
# killed part Q mid-stress-gen and wiped .bench_grids.npz + the compile
# cache again. Remaining wall-clock this session is ~1 h, so stress-grid
# rebuilds (hours) are off the table. This queue's single job: probe until
# the tunnel answers, then run bench.py once to regenerate the headline
# grids and repopulate the compile cache so the driver's end-of-round
# BENCH_r05.json capture finds warm caches and a free chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE (epoch seconds)}

probe() {
    timeout 420 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
EOF
}

echo "=== probe loop start $(date -u +%H:%M:%S) ==="
until probe; do
    left=$((DEADLINE - $(date +%s)))
    echo "=== probe failed, ${left}s to deadline $(date -u +%H:%M:%S) ==="
    [ "$left" -lt 1500 ] && { echo "=== giving up (deadline) ==="; exit 1; }
    sleep 120
done
echo "=== device UP $(date -u +%H:%M:%S) ==="

run() {
    local name=$1 cap=$2; shift 2
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt 300 ] && { echo "=== $name SKIPPED (deadline, ${left}s left)"; return 1; }
    [ "$left" -gt "$cap" ] && left=$cap
    echo "=== $name start (timeout ${left}s) $(date -u +%H:%M:%S) ==="
    timeout "$left" "$@" >> "bench_logs/r05r_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
    git commit -q -m "r05 TPU evidence: ${name} (rc=$rc)" || true
    return 0
}

run headline_prewarm 2700 python bench.py
echo "=== queue done $(date -u +%H:%M:%S) ==="
