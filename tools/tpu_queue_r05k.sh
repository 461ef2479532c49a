#!/bin/bash
# Part K: BPMF production at CANONICAL scale (0.0125 nm, 13.4M-pt
# grids), dt=0.25 fs, friction 5/ps (the fusion-drain rate that keeps
# the ladder finite — measured 19/21 finite states at 0.025 nm vs 3/21
# at friction 1), 128-lane singleton (copy-proof), while-loop SHAKE.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787150700}
left=$((DEADLINE - $(date +%s)))
[ "$left" -lt 300 ] && { echo "no time left"; exit 1; }
mkdir -p bench_logs/bpmf_canonical_fr5
echo "=== bpmf canonical fr5 (timeout ${left}s) $(date -u +%H:%M:%S) ==="
timeout "$left" \
    python examples/bpmf_sampler.py -i tools/bpmf_canonical_input.json \
    --generate-grids --grid-spacing 0.0125 --n-trials 50 --friction 5.0 \
    --singleton-lanes 128 --work-dir bench_logs/bpmf_canonical_fr5 \
    > bench_logs/r05_bpmf_canonical_fr5.log 2>&1
rc=$?
echo "=== bpmf canonical fr5 rc=$rc $(date -u +%H:%M:%S) ==="
python3 -c "
import numpy as np
d = np.loadtxt('bench_logs/bpmf_canonical_fr5/energies.dat', ndmin=2)
print(d.shape, 'finite cols:', np.isfinite(d).all(0).sum(), '/', d.shape[1])
print('trial0 :', d[0, ::5]); print('last   :', d[-1, ::5])"
python tools/emit_bpmf_row.py bench_logs/r05_bpmf_canonical_fr5.log \
    bench_logs/bpmf_canonical_fr5 tools/bpmf_canonical_input.json 0.0125
git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
git commit -q -m "r05 TPU evidence: bpmf production, canonical scale, friction 5/ps (rc=$rc)" || true
