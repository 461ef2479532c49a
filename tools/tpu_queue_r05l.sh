#!/bin/bash
# Part L: triquintic streamed MD row, sized to fit HBM: 25 replicas
# (one shared union region instead of 100-replica pool churn; a
# triquintic region at margin 24 is ~2.1 GB of 256-lane rows, so the
# 100-replica attempt RESOURCE_EXHAUSTED during its retry ladder).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787150700}
if [ $# -ge 1 ] && [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi
left=$((DEADLINE - $(date +%s)))
[ "$left" -lt 420 ] && { echo "no time left (${left}s)"; exit 1; }
echo "=== hermite_triquintic streamed, 25 replicas (timeout ${left}s) $(date -u +%H:%M:%S) ==="
timeout "$left" python bench_canonical.py hermite --method triquintic \
    --dt-fs 0.25 --replicas 25 --steps 500 --margin 24 --fuse streamed \
    >> bench_logs/r05_hermite_triquintic.log 2>&1
rc=$?
echo "=== hermite_triquintic rc=$rc $(date -u +%H:%M:%S) ==="
git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
git commit -q -m "r05 TPU evidence: hermite_triquintic streamed, 25 replicas (rc=$rc)" || true
