#!/bin/bash
# Part J: BPMF production at the reference example's own scale
# (0.025 nm grids, dt=2 fs) — the resolution its shipped workflow
# actually uses; finite-energy production row with drift stats.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787150800}
left=$((DEADLINE - $(date +%s)))
[ "$left" -lt 300 ] && { echo "no time left"; exit 1; }
mkdir -p bench_logs/bpmf_refscale
echo "=== bpmf refscale (timeout ${left}s) $(date -u +%H:%M:%S) ==="
timeout "$left" \
    python examples/bpmf_sampler.py -i tools/bpmf_reference_input.json \
    --generate-grids --grid-spacing 0.025 --n-trials 100 \
    --work-dir bench_logs/bpmf_refscale \
    > bench_logs/r05_bpmf_refscale.log 2>&1
rc=$?
echo "=== bpmf refscale rc=$rc $(date -u +%H:%M:%S) ==="
python tools/emit_bpmf_row.py bench_logs/r05_bpmf_refscale.log \
    bench_logs/bpmf_refscale tools/bpmf_reference_input.json
git add -A bench_logs BENCH_CANONICAL.jsonl tools/bpmf_reference_input.json tools/tpu_queue_r05j.sh 2>/dev/null
git commit -q -m "r05 TPU evidence: bpmf production at reference example scale (rc=$rc)" || true
