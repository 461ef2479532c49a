#!/bin/bash
# Round-5 TPU evidence queue, part H: BPMF production retry at the
# measured-stable dt=0.25 fs with the copy-proof 128-lane singleton
# (part G's 64-lane fused singleton OOM'd: XLA copy-inserted a 2x
# padded 6.37 GiB duplicate inside the segment program; at 128 lanes
# there is nothing to pad — args 12.7 GiB + program fits 15.75 GiB).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787150900}
left=$((DEADLINE - $(date +%s)))
[ "$left" -lt 600 ] && { echo "no time left"; exit 1; }
mv bench_logs/r05_bpmf.log bench_logs/r05_bpmf_attempt4.log 2>/dev/null
rm -f bench_logs/bpmf_canonical/energies.dat
echo "=== bpmf retry (128-lane singleton, timeout ${left}s) $(date -u +%H:%M:%S) ==="
timeout "$left" env OPENMMGRIDFORCE_SHAKE_STATIC=32 \
    python examples/bpmf_sampler.py -i tools/bpmf_canonical_input.json \
    --generate-grids --grid-spacing 0.0125 --n-trials 50 \
    --singleton-lanes 128 --work-dir bench_logs/bpmf_canonical \
    >> bench_logs/r05_bpmf.log 2>&1
rc=$?
echo "=== bpmf rc=$rc $(date -u +%H:%M:%S) ==="
python tools/emit_bpmf_row.py bench_logs/r05_bpmf.log \
    bench_logs/bpmf_canonical tools/bpmf_canonical_input.json
git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
git commit -q -m "r05 TPU evidence: bpmf production retry, 128-lane singleton (rc=$rc)" || true
