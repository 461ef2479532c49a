#!/usr/bin/env python
"""Profile the headline MD step (VERDICT r2 item 3).

1. Captures a jax.profiler trace of the 1000x47 fused B-spline MD scan
   on the TPU, parses the xplane protobuf, and prints the top device
   ops with self-times — WHERE the per-step time actually goes.
2. Measures the one untried SURVEY 7.3 mitigation: Morton/cell-sorted
   atom ordering to localize the row gathers, as clouds pre-sorted by
   cell id at build time — the ZERO-RUNTIME-COST upper bound on any
   sorting scheme (a per-step on-device argsort can only do worse).
   Verdict rule: adopt anything >10%.

Usage: python profile_headline.py [--steps 1000] [--replicas 1000]
Writes the op table to PROFILE_HEADLINE.md and appends JSON rows to
BENCH_CANONICAL.jsonl (stage "profile").
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_xplane(trace_dir):
    """Top device ops by self-time from the newest xplane.pb
    (jax.profiler.ProfileData; no tensorboard dependency)."""
    from jax.profiler import ProfileData
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None, "no xplane.pb produced"
    xspace = ProfileData.from_file(paths[-1])
    rows = []
    planes = []
    for plane in xspace.planes:
        planes.append(plane.name)
        if "TPU" not in plane.name and "tpu" not in plane.name \
                and "/device:" not in plane.name:
            continue
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                us = (ev.end_ns - ev.start_ns) / 1e3
                agg[ev.name] = agg.get(ev.name, 0.0) + us
        for name, us in sorted(agg.items(), key=lambda kv: -kv[1]):
            rows.append((plane.name, name, us))
    return rows, f"planes: {planes}"


def build(args, order="natural"):
    import jax
    import jax.numpy as jnp

    import bench

    dtype = jnp.float32
    dev = jax.devices()[0]
    system, bindings, states, _ = bench.build_workload(
        dtype, dev, args.replicas)
    if order == "sorted":
        # per-replica Morton/cell sort of the atom axis. Bonded terms
        # reference atom indices, so for the measurement we sort the
        # GATHER side only: the grid binding's scaling columns and the
        # position rows fed to the grid eval. For the pre-sorted
        # variant we sort the whole state ONCE (bonded indices are
        # remapped), giving the zero-cost upper bound.
        multi = bindings[0].grid
        ncx, ncy, ncz = multi.cell_counts
        origin = np.asarray(multi.origin)
        spacing = np.asarray(multi.spacing)
        pos = np.asarray(states.positions)          # [R, N, 3]
        t = (pos - origin) / spacing
        ixyz = np.clip(t.astype(int), 0, np.asarray(multi.counts) - 2)
        cell = ((ixyz[..., 0] * ncy) + ixyz[..., 1]) * ncz + ixyz[..., 2]
        perm = np.argsort(cell, axis=1)             # [R, N]
        if order == "sorted":
            # same permutation for every replica (replicas share the
            # pose): remap the system's bonded terms once
            p0 = perm[0]
            inv = np.argsort(p0)
            pos_s = pos[:, p0]
            states = states._replace(
                positions=jnp.asarray(pos_s, dtype),
                velocities=states.velocities[:, p0])
            import dataclasses
            system = dataclasses.replace(
                system,
                masses=system.masses[p0],
                charges=system.charges[p0],
                sigmas=system.sigmas[p0],
                epsilons=system.epsilons[p0],
                bond_idx=jnp.asarray(inv)[system.bond_idx],
                angle_idx=jnp.asarray(inv)[system.angle_idx],
                torsion_idx=jnp.asarray(inv)[system.torsion_idx],
                pairs=jax.tree.map(
                    lambda x: (x[p0][:, p0]
                               if getattr(x, "ndim", 0) == 2
                               and x.shape[0] == len(p0)
                               == x.shape[1] else
                               (x[p0] if getattr(x, "ndim", 0) >= 1
                                and x.shape[0] == len(p0) else x)),
                    system.pairs),
            )
            from openmmgridforce_tpu.mm import GridBinding
            bindings = [GridBinding(grid=multi,
                                    scaling=bindings[0].scaling[:, p0])]
    return system, bindings, states


def time_run(args, order):
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu.mm import make_md_runner
    system, bindings, states = build(args, order)
    # dt 0.5 fs: the canonical-bench MD default. At 1 fs (the headline
    # bench's dt) ~1/1000 unconstrained replicas hits a capped-grid
    # fusion spike and goes non-finite within 1000 steps (measured r5);
    # steps/s is dt-independent (same program, different scalar), so
    # profile at the stable dt and keep the finiteness check meaningful.
    run = make_md_runner(args.steps, dt=args.dt_fs * 1e-3, friction=5.0)
    temps = jnp.full((args.replicas,), 300.0, jnp.float32)
    # two untimed passes (the second can still recompile on fresh
    # committed arrays), then best of two timed
    states = jax.block_until_ready(run(states, system, bindings, temps))
    states = jax.block_until_ready(run(states, system, bindings, temps))
    best = 0.0
    for _ in range(2):
        t0 = time.time()
        out = jax.block_until_ready(run(states, system, bindings, temps))
        best = max(best, args.steps / (time.time() - t0))
    finite = np.isfinite(np.asarray(out.positions)).all(axis=(1, 2))
    n_bad = int((~finite).sum())
    if n_bad:
        log(f"  WARNING: {n_bad}/{args.replicas} replicas non-finite "
            f"after {4 * args.steps} steps at dt={args.dt_fs} fs")
    assert n_bad <= max(1, args.replicas // 100), \
        f"{n_bad} non-finite replicas - not a tail event"
    return best, n_bad


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--replicas", type=int, default=1000)
    p.add_argument("--trace-steps", type=int, default=50)
    p.add_argument("--dt-fs", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu.mm import make_md_runner

    results = {}
    log("baseline (natural order) ...")
    results["natural"], bad_nat = time_run(args, "natural")
    log(f"  {results['natural']:.1f} steps/s")
    log("cell-sorted clouds (zero-cost upper bound) ...")
    results["sorted"], bad_sort = time_run(args, "sorted")
    log(f"  {results['sorted']:.1f} steps/s")

    # trace a short scan (the trace of a 1000-step scan is huge)
    system, bindings, states = build(args, "natural")
    run = make_md_runner(args.trace_steps, dt=args.dt_fs * 1e-3,
                         friction=5.0)
    temps = jnp.full((args.replicas,), 300.0, jnp.float32)
    states = jax.block_until_ready(run(states, system, bindings, temps))
    trace_dir = "/tmp/jaxprof_headline"
    os.makedirs(trace_dir, exist_ok=True)
    try:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(run(states, system, bindings, temps))
        rows, note = parse_xplane(trace_dir)
    except Exception as e:
        rows, note = None, f"trace failed: {type(e).__name__}: {e}"

    gain = results["sorted"] / results["natural"] - 1.0
    verdict = ("ADOPT" if gain > 0.10 else "REJECT")

    # --- roofline / MFU statement (VERDICT r3 missing #4) -----------
    # Traffic & flop model of one ensemble step (R replicas x 47 atoms,
    # charge+ljr fused + lja packed B-spline, Langevin):
    R, A = args.replicas, int(states.positions.shape[-2])
    row_bytes = 128 * 4 + 64 * 4          # fused pair row + lja row
    state_bytes = R * A * 3 * 4 * 8       # pos/vel/forces/noise r+w
    hbm_bytes = R * A * row_bytes + state_bytes
    # VPU flops: 4 tensor-contraction einsums/grid-set (~2*64*3 MACs
    # each at d=4) + basis + bonded/pairs (dense 47x47) + integrator
    flops = R * (A * (2 * 64 * 4 * 2 * 3 + 300)
                 + A * A * 30 + A * 60)
    # on-device step time: subtract the amortized tunnel RTT one
    # dispatch carries (CLAUDE.md: ~31 ms / N steps)
    t_wall = 1.0 / results["natural"]
    t_dev = max(t_wall - 0.031 / args.steps, 1e-9)
    HBM_PEAK = 819e9                      # v5e HBM GB/s
    VPU_PEAK_F32 = 49e12 / 2              # v5e ~197 bf16 TFLOPs MXU;
    # f32 VPU vector flops peak ~ 24.6 TFLOPs (8 MACs/ALU/cycle class)
    achieved_bw = hbm_bytes / t_dev
    achieved_fl = flops / t_dev
    roofline = {
        "hbm_bytes_per_step": hbm_bytes,
        "model_flops_per_step": flops,
        "on_device_step_us": round(t_dev * 1e6, 1),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "hbm_peak_frac": round(achieved_bw / HBM_PEAK, 4),
        "achieved_gflops": round(achieved_fl / 1e9, 1),
        "vpu_peak_frac": round(achieved_fl / VPU_PEAK_F32, 4),
        "binding_constraint": (
            "per-instruction gather issue + VPU elementwise latency at "
            "47-atom row granularity - far below both the HBM and "
            "FLOP rooflines (MXU/MFU is the wrong axis: the step has "
            "no large matmuls by design; one-hot force assembly is "
            "the only MXU use)"),
    }

    out = {
        "stage": "profile", "replicas": args.replicas,
        "steps": args.steps,
        "dt_fs": args.dt_fs,
        "natural_steps_per_s": round(results["natural"], 1),
        "cell_sorted_steps_per_s": round(results["sorted"], 1),
        "nonfinite_replicas": [bad_nat, bad_sort],
        "sorted_gain": round(gain, 4), "morton_verdict": verdict,
        "trace_note": note,
        **roofline,
    }
    with open(os.path.join(HERE, "BENCH_CANONICAL.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)

    with open(os.path.join(HERE, "PROFILE_HEADLINE.md"), "w") as f:
        f.write("# Headline-step profile (1000x47 fused B-spline MD)\n\n")
        f.write(f"- natural atom order: "
                f"{results['natural']:.1f} steps/s\n")
        f.write(f"- cell-sorted clouds (zero-runtime-cost upper "
                f"bound): {results['sorted']:.1f} steps/s "
                f"({gain:+.1%}) -> **{verdict}** "
                f"(adopt threshold +10%)\n\n")
        f.write(f"Trace: {note}\n\n")
        f.write("## Roofline\n\n")
        f.write(f"- on-device step (RTT-corrected): "
                f"{roofline['on_device_step_us']} us\n")
        f.write(f"- modeled HBM traffic {hbm_bytes / 1e6:.1f} MB/step -> "
                f"achieved {roofline['achieved_hbm_gbps']} GB/s = "
                f"{roofline['hbm_peak_frac']:.1%} of v5e's 819 GB/s\n")
        f.write(f"- modeled {flops / 1e9:.2f} GFLOP/step -> achieved "
                f"{roofline['achieved_gflops']} GFLOPS = "
                f"{roofline['vpu_peak_frac']:.1%} of the ~24.6 TFLOP "
                f"f32 VPU ceiling\n")
        f.write(f"- binding constraint: "
                f"{roofline['binding_constraint']}\n\n")
        f.write("The step is NOT bandwidth- or FLOP-bound: 47-atom row "
                "gathers are priced per instruction and per 128-lane "
                "tile (CLAUDE.md perf log), and the measured "
                "alternatives that would raise arithmetic density "
                "(factorized matmul chains, Pallas eval kernels, "
                "coefficient-major layouts) were all SLOWER in-scan. "
                "The remaining levers are batching (more replicas per "
                "gather row: done via fusion) and dispatch "
                "amortization (done via 1000-step scans).\n\n")
        if rows:
            f.write("Top device ops by self-time over "
                    f"{args.trace_steps} traced steps:\n\n")
            f.write("| plane | op | self-time (us) |\n|---|---|---|\n")
            for plane, name, us in rows[:40]:
                f.write(f"| {plane} | {name[:80]} | {us:,.0f} |\n")
    log("wrote PROFILE_HEADLINE.md")


if __name__ == "__main__":
    main()
