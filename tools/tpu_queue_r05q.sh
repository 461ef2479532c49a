#!/bin/bash
# Part Q (session 10): part P's stress_gen stage hit its 10800 s cap at
# 47% of the lja stress grid (charge took 4675 s + ljr 4054 s of the
# budget), so stress_md died on the missing file 7 s later. stress-gen
# skips cached grids, so this queue just finishes lja (~4-5 ks alone)
# and then runs the representative stress-MD (parity gate + fusion-trap
# drain rounds). Probe first: part P's gen was timeout-killed
# mid-transfer, which can wedge the tunnel for a few minutes.
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
    sleep 300
done
echo "=== device UP $(date -u +%H:%M:%S) ==="

run() {
    local name=$1 cap=$2; shift 2
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt 900 ] && { echo "=== $name SKIPPED (deadline, ${left}s left)"; return 1; }
    [ "$left" -gt "$cap" ] && left=$cap
    echo "=== $name start (timeout ${left}s) $(date -u +%H:%M:%S) ==="
    timeout "$left" "$@" >> "bench_logs/r05q_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
    git commit -q -m "r05 TPU evidence: ${name} (rc=$rc)" || true
    return 0
}

run stress_gen 9000 python bench_canonical.py stress-gen
run stress_md 10800 python bench_canonical.py stress-md
echo "=== queue done $(date -u +%H:%M:%S) ==="
