#!/bin/bash
# Round-5 TPU evidence queue — serialized, timeout-bounded, committing
# after every stage so a crash loses at most one step. Safe to re-run:
# completed stages are skipped via bench_logs/r05_<name>.done markers.
#
# Usage: nohup bash tools/tpu_queue_r05.sh > /tmp/queue_r05.log 2>&1 &
# (never run while another process holds the TPU — single-user device)

set -u
cd /root/repo
mkdir -p bench_logs
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
    local name=$1 t=$2; shift 2
    local done_mark="bench_logs/r05_${name}.done"
    if [ -f "$done_mark" ]; then echo "skip $name (done)"; return 0; fi
    echo "=== $name: $* (timeout ${t}s) ==="
    timeout "$t" "$@" >> "bench_logs/r05_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc ==="
    [ $rc -eq 0 ] && touch "$done_mark"
    git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
    git commit -q -m "r05 TPU evidence: $name (rc=$rc)" || true
    return $rc
}

# 1. headline bench (driver also runs this; here for standalone record)
run bench 3600 python bench.py
# 2. step profile + Morton upper bound + roofline/MFU
run profile 5400 python profile_headline.py
# 3. canonical value grids, jnp backend, cold/warm split (charge outlier)
run gen_jnp 5400 python bench_canonical.py gen --force --backend jnp
# 4. canonical value grids, Pallas backend
run gen_pallas 5400 python bench_canonical.py gen --force --backend pallas
# 5. 27-derivative grids, Pallas kernel (also populates accuracy caches)
run derivs_pallas 10800 python bench_canonical.py derivs --force --backend pallas
# 6. accuracy sweep: all grids x methods incl. compensated tier
run accuracy 14400 python bench_canonical.py accuracy
# 7/8. Hermite MD rows at canonical resolution
run hermite_tricubic 7200 python bench_canonical.py hermite --method tricubic
run hermite_triquintic 10800 python bench_canonical.py hermite --method triquintic
# 9. compensated-tier real-chip cost
run comp_cost 3600 python tools/bench_compensated_tpu.py
# 10. canonical MD refresh
run md 7200 python bench_canonical.py md
# 11. stress-scale tiled generation (rebuilds 2.5 GB tiled files)
run stress_gen 14400 python bench_canonical.py stress-gen --force
# 12. post-fix stress MD rerun
run stress_md 14400 python bench_canonical.py stress-md --skip-parity
# 13. BPMF production workflow at canonical scale
run bpmf 21600 python examples/bpmf_sampler.py -i tools/bpmf_canonical_input.json \
    --generate-grids --grid-spacing 0.0125 --n-trials 50
echo "queue complete"
