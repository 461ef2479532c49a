#!/usr/bin/env python
"""Turn a BPMF production run's artifacts into a BENCH_CANONICAL row.

Reads the sampler log (stdout of examples/bpmf_sampler.py) and the
work-dir's energies.dat (one line per trial, one column per ladder
state, kcal/mol) and appends a `stage: "bpmf-production"` row. Works on
a timeout-killed run too: trials and rate are recovered from
energies.dat line count and file mtimes when the final summary line
never printed.

Usage: python tools/emit_bpmf_row.py <log> <work_dir> <input.json>
"""
import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    log_path, work_dir, cfg_path = sys.argv[1:4]
    spacing = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0125
    cfg = json.load(open(cfg_path))
    text = open(log_path, errors="replace").read()

    row = {"stage": "bpmf-production",
           "nstate": cfg["nstate"],
           "ntrial_repX": cfg["ntrial_repX"],
           "ntrial_gMC": cfg["ntrial_gMC"],
           "nstep_MD": cfg["nstep_MD"],
           "nstep_equil": cfg.get("nstep_equil", 0),
           "dt_fs": cfg["CD"]["delta_t"],
           "grid_spacing_nm": spacing}

    m = re.search(r"(\d+) trials in ([\d.]+)s \(([\d,]+) replica-steps/s\)",
                  text)
    edat = os.path.join(work_dir, "energies.dat")
    e = np.loadtxt(edat, ndmin=2) if os.path.exists(edat) else np.zeros((0, 1))
    if m:
        trials, elapsed = int(m.group(1)), float(m.group(2))
        row["replica_steps_per_s"] = float(m.group(3).replace(",", ""))
        row["completed"] = True
    else:
        # timeout-killed: trial count from energies.dat; wall time per
        # trial is not recoverable from a single mtime, so rate fields
        # stay absent (the log's own timestamps bound it if needed)
        trials = len(e)
        row["completed"] = False
        elapsed = None
    row["trials"] = trials
    if elapsed:
        row["elapsed_s"] = round(elapsed, 1)
        row["trials_per_hour"] = round(trials / elapsed * 3600.0, 1)

    m = re.search(r"exchange acceptance: (\d+)/(\d+)", text)
    if m:
        row["exchange_accept"] = f"{m.group(1)}/{m.group(2)}"
    m = re.search(r"gMC acceptance: (\d+)/(\d+)", text)
    if m:
        row["gmc_accept"] = f"{m.group(1)}/{m.group(2)}"

    # how much of the ladder stayed numerically alive: fusion events on
    # capped grids can NaN replicas (physics present in the reference
    # too); a row with NaN drift must say how many states survived
    if e.size:
        row["finite_state_cols"] = int(np.isfinite(e).all(axis=0).sum())
        row["state_cols"] = int(e.shape[1])

    # energy drift at the target state (column 0): mean of the first vs
    # last quarter of production trials, in kcal/mol and relative to the
    # per-trial fluctuation scale
    if len(e) >= 8:
        q = len(e) // 4
        first, last = e[:q, 0], e[-q:, 0]
        sd = float(e[:, 0].std())
        row["state0_mean_first_quarter_kcal"] = round(float(first.mean()), 3)
        row["state0_mean_last_quarter_kcal"] = round(float(last.mean()), 3)
        row["state0_drift_kcal"] = round(float(last.mean() - first.mean()), 3)
        row["state0_drift_over_std"] = round(
            float(last.mean() - first.mean()) / sd, 3) if sd else 0.0

    import bench_canonical as bc
    bc.emit(row)


if __name__ == "__main__":
    main()
