#!/bin/bash
# Part M (session 6): the remaining TPU evidence, value-ordered.
#   1. compensated-tpu row at TRIQUINTIC on the lja window (the grid
#      that fails the plain-f32 1e-5 gate): proves the d=6 compensated
#      tier compiles+runs jitted on the real chip (the XLA:CPU runtime
#      pathology is CPU-only) and records its accuracy + cost ratio.
#   2. compensated-tpu row at TRICUBIC on lja (cheap, completes the
#      method x tier matrix on-device).
#   3. stress-gen: rebuild the 209M-pt ljr/lja tiled grids the machine
#      restart wiped (charge is cached).
#   4. stress-md --skip-parity: the post-fix rerun (VERDICT r3 next #1d).
# Commits per stage. Hard deadline: skip stages within 15 min of it so
# the driver's end-of-round bench.py finds a free chip.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE (epoch seconds)}

run() {
    local name=$1 cap=$2; shift 2
    local left=$((DEADLINE - $(date +%s)))
    [ "$left" -lt 900 ] && { echo "=== $name SKIPPED (deadline, ${left}s left)"; return 1; }
    [ "$left" -gt "$cap" ] && left=$cap
    echo "=== $name start (timeout ${left}s) $(date -u +%H:%M:%S) ==="
    timeout "$left" "$@" >> "bench_logs/r05m_${name}.log" 2>&1
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
run stress_gen 16200 python bench_canonical.py stress-gen
run stress_md 10800 python bench_canonical.py stress-md --skip-parity
echo "=== queue done $(date -u +%H:%M:%S) ==="
