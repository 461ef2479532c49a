#!/bin/bash
# Part O (session 8): representative stress-MD row with the fusion-trap
# drain protocol (BENCH_MATRIX "stress-MD rerun collapse" follow-through).
#   1. stress-gen: rebuild the 209M-pt tiled grids (restart wiped them
#      again). Box is idle -> expect r3's uncontended ~23 min total.
#   2. stress-md WITH the parity gate (validates the rebuild) and the
#      default drain protocol (redraw_hot_velocities between
#      equilibration rounds) before the timed window.
# Commits per stage. Stages are separate processes so the chip frees at
# every boundary; the driver's bench.py probe (600 s) rides those gaps
# if the round ends mid-queue.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
    local name=$1 cap=$2; shift 2
    echo "=== $name start (timeout ${cap}s) $(date -u +%H:%M:%S) ==="
    timeout "$cap" "$@" >> "bench_logs/r05o_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
    git commit -q -m "r05 TPU evidence: ${name} (rc=$rc)" || true
}

run stress_gen 7200 python bench_canonical.py stress-gen
run stress_md 7200 python bench_canonical.py stress-md
echo "=== queue done $(date -u +%H:%M:%S) ==="
