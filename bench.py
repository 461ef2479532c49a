#!/usr/bin/env python
"""Headline benchmark: grid-ligand Langevin MD, 1000 vmapped replicas.

Measures MD steps/sec/chip where each step advances ALL replicas (the
BPMF production workload: ligand on charge/ljr/lja receptor grids with
intramolecular forces, classic Langevin).

Baseline: the reference platform evaluates replicas serially on CPU in
double precision (example/sampler.py runs N Simulations in a Python loop,
SURVEY section 3.3). As its stand-in we time the SAME single-replica step
on the CPU backend in float32 (XLA-compiled CPU is, if anything, faster
than the reference's scalar C++ loop, and f32 is faster than its f64 —
both choices make vs_baseline conservative) and divide by the replica
count for ensemble throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_workload(dtype, device, n_replicas, grids_np=None):
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import (GridBinding, load_inpcrd,
                                        load_prmtop, system_from_amber)
    from openmmgridforce_tpu.ops import gridgen
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    from openmmgridforce_tpu.parallel import init_replica_states

    DATA = "/root/reference/python/prmtopcrd"
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")

    lo = crd.min(0) - 1.0
    spacing = (0.025, 0.025, 0.025)
    counts = tuple(int(c) + 1 for c in
                   np.ceil((crd.max(0) + 1.0 - lo) / spacing))

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_grids.npz")
    with jax.default_device(device):
        if grids_np is None and os.path.exists(cache):
            z = np.load(cache)
            if tuple(z["counts"]) == counts:
                grids_np = {gt: z[gt] for gt in ["charge", "ljr", "lja"]}
                log("loaded cached grids")
        if grids_np is None:
            rec = load_prmtop(f"{DATA}/receptor.prmtop")
            rec_crd = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
            t0 = time.time()
            grids_np = {}
            for gt in ["charge", "ljr", "lja"]:
                g = gridgen.generate_grid(
                    counts, spacing, lo, gt, rec_crd, rec.charges,
                    rec.sigmas, rec.epsilons, dtype=dtype)
                grids_np[gt] = np.asarray(g.vals)
            log(f"grid generation ({np.prod(counts):,} pts x 3 on "
                f"{device.platform}): {time.time() - t0:.1f}s")
            np.savez(cache, counts=np.asarray(counts), **grids_np)

        packs, scalings = [], []
        for gt in ["charge", "ljr", "lja"]:
            grid = Grid.create(grids_np[gt], spacing, lo,
                               interp_method=InterpolationMethod.BSPLINE,
                               dtype=dtype)
            packs.append(pack_grid(grid))
            scalings.append(np.asarray(gridgen.auto_scaling_factors(
                gt, lig.charges, lig.sigmas, lig.epsilons)))
        # fuse the co-located charge/ljr/lja grids: one gather per atom
        multi = combine_packed_grids(packs)
        bindings = [GridBinding(grid=multi,
                                scaling=jnp.asarray(np.stack(scalings),
                                                    dtype))]

        system = system_from_amber(lig, dtype=dtype, hydrogen_mass=4.0)
        states = init_replica_states(
            jax.random.PRNGKey(0), jnp.asarray(crd, dtype), system.masses,
            300.0, n_replicas)
        states = jax.device_put(states, device)
    return system, bindings, states, grids_np


def time_steps(system, bindings, states, n_steps, device):
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu.mm import make_md_runner

    with jax.default_device(device):
        run = make_md_runner(n_steps, dt=0.001, friction=5.0)
        temps = jnp.full((states.positions.shape[0],), 300.0,
                         states.positions.dtype)
        # compile + warm
        states = jax.block_until_ready(run(states, system, bindings, temps))
        t0 = time.time()
        states = jax.block_until_ready(run(states, system, bindings, temps))
        dt = time.time() - t0
    return n_steps / dt


def main():
    import jax

    n_replicas = int(os.environ.get("BENCH_REPLICAS", "1000"))
    n_steps = int(os.environ.get("BENCH_STEPS", "1000"))

    # Probe the accelerator in a bounded subprocess first: a dead axon
    # tunnel hangs ~25 min inside backend init (measured r4), which
    # would stall this process un-interruptibly. A 600 s probe is
    # generous for a live tunnel (~30 s init).
    fallback_reason = None
    try:
        import subprocess
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); "
             "import jax.numpy as jnp; jnp.ones(8).sum()"],
            check=True, timeout=int(os.environ.get("BENCH_PROBE_S", "600")),
            capture_output=True)
        accel = jax.devices()[0]
    except Exception as e:
        # Accelerator backend unavailable (e.g. the axon TPU tunnel is
        # down, as in rounds 3-4). Record a clearly-marked CPU
        # measurement instead of exiting 1 so the round still captures a
        # real number; the metric/unit names say exactly what was run.
        fallback_reason = str(e).splitlines()[0][:200]
        log(f"accelerator unavailable ({fallback_reason}); "
            "FALLING BACK TO CPU with reduced sizes")
        # pin the process to the host backend BEFORE the first device
        # query: a bare jax.devices("cpu") still initializes every
        # registered plugin, and a dead axon tunnel hangs ~25 min there
        jax.config.update("jax_platforms", "cpu")
        accel = jax.devices("cpu")[0]
        n_replicas = int(os.environ.get("BENCH_REPLICAS_CPU", "32"))
        n_steps = min(n_steps, 100)
    log(f"benchmark device: {accel} ({n_replicas} replicas, "
        f"{n_steps} timed steps)")
    import jax.numpy as jnp
    dtype = jnp.float32

    system, bindings, states, grids_np = build_workload(dtype, accel,
                                                        n_replicas)
    value = time_steps(system, bindings, states, n_steps, accel)
    n_atoms = states.positions.shape[-2]
    n_grids = bindings[0].grid.num_grids
    log(f"TPU ensemble throughput: {value:,.1f} MD steps/s "
        f"x {n_replicas} replicas "
        f"({value * n_replicas:,.0f} replica-steps/s; "
        f"{value * n_replicas * n_atoms * n_grids / 1e6:,.1f}M grid "
        f"atom-evals/s)")

    # reference-platform stand-in: single replica, CPU backend
    vs_baseline = None
    try:
        cpu = jax.devices("cpu")[0]
        sys_c, bind_c, states_c, _ = build_workload(dtype, cpu, 1,
                                                    grids_np=grids_np)
        cpu_single = time_steps(sys_c, bind_c, states_c,
                                max(20, n_steps // 10), cpu)
        baseline = cpu_single / n_replicas  # serial ensemble throughput
        vs_baseline = value / baseline
        log(f"CPU single-replica stand-in: {cpu_single:,.1f} steps/s -> "
            f"serial {n_replicas}-replica baseline {baseline:,.2f} steps/s")
        log("CAVEAT: vs_baseline uses a STAND-IN baseline (XLA-compiled "
            "f32 single-replica CPU step / replica count), not the real "
            "reference build — OpenMM is not installable in this image. "
            "The stand-in is, if anything, FASTER than the reference's "
            "serial f64 C++ loop, so vs_baseline is conservative "
            "(BASELINE.md has the full argument).")
    except Exception as e:  # CPU backend unavailable: report raw value
        log(f"baseline measurement failed: {e}")

    row = {
        "metric": f"grid_ligand_langevin_md_steps_per_sec_{n_replicas}"
                  "_replicas",
        "value": round(value, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    if fallback_reason:
        # Same workload, same vectorized-vs-serial comparison, but run on
        # the host CPU because the accelerator was unreachable. The
        # vs_baseline ratio (vmapped batch vs serial single-replica loop
        # on the SAME hardware) stays apples-to-apples; the absolute
        # value is NOT a TPU number.
        row["metric"] = "CPU_FALLBACK_" + row["metric"]
        row["unit"] = "steps/s/host (accelerator unavailable)"
        row["fallback_reason"] = fallback_reason
    print(json.dumps(row))


if __name__ == "__main__":
    main()
