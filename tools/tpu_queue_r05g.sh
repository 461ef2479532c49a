#!/bin/bash
# Round-5 TPU evidence queue, part G (final): BPMF production at the
# measured-stable dt=0.25 fs (attempt 3 proved the OOM fixes end-to-end
# but dt=2 fs fusion-NaN'd the ladder), then the triquintic streamed row
# at stress-MD's replica count (1000 thermally-diverging replicas
# fragmented the region pool; every re-pack is a ~440 MB tunnel upload).
#
# Usage: nohup bash tools/tpu_queue_r05g.sh <wait_pid> > /tmp/queue_r05g.log 2>&1 &

set -u
cd /root/repo
mkdir -p bench_logs
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787151000}

if [ $# -ge 1 ] && [ -n "$1" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
git commit -q -m "r05 TPU evidence: hermite_triquintic attempt (region-churn bound)" || true

run() {
    local name=$1 t=$2; shift 2
    local done_mark="bench_logs/r05_${name}.done"
    if [ -f "$done_mark" ]; then echo "skip $name (done)"; return 0; fi
    local left=$((DEADLINE - $(date +%s)))
    if [ "$left" -lt 600 ]; then
        echo "skip $name (deadline: ${left}s left)"; return 1
    fi
    [ "$t" -gt "$left" ] && t=$left
    echo "=== $name: $* (timeout ${t}s) $(date -u +%H:%M:%S) ==="
    timeout "$t" "$@" >> "bench_logs/r05_${name}.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc $(date -u +%H:%M:%S) ==="
    [ $rc -eq 0 ] && touch "$done_mark"
    git add -A bench_logs BENCH_CANONICAL.jsonl BENCH_MATRIX.md 2>/dev/null
    git commit -q -m "r05 TPU evidence: $name (rc=$rc)" || true
    return $rc
}

# supersede attempt 3 (dt=2 fs, all-NaN energies)
rm -f bench_logs/r05_bpmf.done bench_logs/r05_bpmf_row.done
mv bench_logs/r05_bpmf.log bench_logs/r05_bpmf_attempt3.log 2>/dev/null
rm -f bench_logs/bpmf_canonical/energies.dat

run bpmf 3000 \
    env OPENMMGRIDFORCE_SHAKE_STATIC=32 \
    python examples/bpmf_sampler.py -i tools/bpmf_canonical_input.json \
    --generate-grids --grid-spacing 0.0125 --n-trials 50 \
    --singleton-lanes 64 --work-dir bench_logs/bpmf_canonical
if [ -f bench_logs/r05_bpmf.log ]; then
    python tools/emit_bpmf_row.py bench_logs/r05_bpmf.log \
        bench_logs/bpmf_canonical tools/bpmf_canonical_input.json \
        && touch bench_logs/r05_bpmf_row.done
    git add -A bench_logs BENCH_CANONICAL.jsonl 2>/dev/null
    git commit -q -m "r05 TPU evidence: bpmf production row (dt=0.25 fs)" || true
fi

mv bench_logs/r05_hermite_triquintic.log \
   bench_logs/r05_hermite_triquintic_attempt3.log 2>/dev/null
run hermite_triquintic 3600 \
    python bench_canonical.py hermite --method triquintic --dt-fs 0.25 \
    --replicas 100 --margin 24
echo "queue G complete $(date -u +%H:%M:%S)"
