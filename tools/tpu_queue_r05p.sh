#!/bin/bash
# Part P (session 9, post another machine restart at 23:50 UTC):
# watch-queue. The restart wiped .bench_grids.npz, .bench_stress/ and
# the JAX compile cache again, and the first post-restart probe hung
# for its full 600 s — so probe every ~9 min and, the moment the
# device answers, run the remaining evidence in value order:
#   1. headline prewarm (bench.py): regenerates .bench_grids.npz +
#      repopulates the compile cache so the driver's end-of-round
#      BENCH_r05.json capture finds warm caches and a free chip.
#   2. stress-gen: rebuild the 209M-pt tiled grids (wiped again).
#   3. stress-md WITH the parity gate and the fusion-trap drain
#      protocol (redraw_hot_velocities rounds) — the representative
#      rerun that part M's collapsed row motivated.
# Commits per stage. Hard deadline: skip stages within 15 min of it so
# the driver's bench.py finds a free chip at round end.
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
    [ "$left" -lt 2700 ] && { echo "=== giving up (deadline) ==="; exit 1; }
    sleep 540
done
echo "=== device UP $(date -u +%H:%M:%S) ==="

run() {
    local name=$1 cap=$2; shift 2
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt 900 ] && { echo "=== $name SKIPPED (deadline, ${left}s left)"; return 1; }
    [ "$left" -gt "$cap" ] && left=$cap
    echo "=== $name start (timeout ${left}s) $(date -u +%H:%M:%S) ==="
    timeout "$left" "$@" >> "bench_logs/r05p_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
    git commit -q -m "r05 TPU evidence: ${name} (rc=$rc)" || true
    return 0
}

run headline 3600 python bench.py
run stress_gen 10800 python bench_canonical.py stress-gen
run stress_md 10800 python bench_canonical.py stress-md
echo "=== queue done $(date -u +%H:%M:%S) ==="
