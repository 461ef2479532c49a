#!/bin/bash
# Part I: A/B — identical BPMF run but with the convergence-tested
# while-loop SHAKE (no OPENMMGRIDFORCE_SHAKE_STATIC). The 128-lane
# singleton already removed the copy-OOM that motivated static SHAKE;
# if this run's energies are finite, the static Jacobi sweeps were the
# NaN source (divergence on large displacements, not dt).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787150800}
left=$((DEADLINE - $(date +%s)))
[ "$left" -lt 300 ] && { echo "no time left"; exit 1; }
mkdir -p bench_logs/bpmf_ab
echo "=== bpmf A/B while-SHAKE (timeout ${left}s) $(date -u +%H:%M:%S) ==="
timeout "$left" \
    python examples/bpmf_sampler.py -i tools/bpmf_canonical_input.json \
    --generate-grids --grid-spacing 0.0125 --n-trials 5 \
    --singleton-lanes 128 --work-dir bench_logs/bpmf_ab \
    > bench_logs/r05_bpmf_ab.log 2>&1
rc=$?
echo "=== bpmf A/B rc=$rc $(date -u +%H:%M:%S) ==="
python3 - <<'PY'
import numpy as np
try:
    d = np.loadtxt('bench_logs/bpmf_ab/energies.dat', ndmin=2)
    print('energies', d.shape, 'finite:', np.isfinite(d).all())
    print(d[:, ::5])
except Exception as e:
    print('no energies:', e)
PY
