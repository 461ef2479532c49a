#!/usr/bin/env python
"""Multi-pose docking screen: score thousands of ligand poses in one batch.

The TPU-native replacement for the reference's multi-ligand particle-group
batching (GridForce.addParticleGroup + getParticleGroupEnergies,
CudaGridForceKernels.cpp:607-675): poses are a leading vmap axis over ONE
fused multi-grid evaluation — per-pose energies fall out as the batched
result, with no flattening bookkeeping.

Usage: python docking_screen.py [--poses 4096] [--spacing 0.025]
"""

import argparse
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo, "openmmgridforce_tpu")):
    sys.path.insert(0, _repo)


def random_poses(rng, crd, zmatrix, primary, n_poses, torsion_sigma=0.8,
                 translate_sigma=0.15):
    """Perturb torsions in BAT space plus a rigid-body jitter."""
    from openmmgridforce_tpu.sampling import bat_to_xyz, xyz_to_bat

    base = xyz_to_bat(crd, zmatrix, primary)
    n_t = len(zmatrix)
    poses = np.empty((n_poses,) + crd.shape, np.float32)
    for p in range(n_poses):
        b = base.copy()
        b[9 + 2 * n_t:] += rng.normal(0.0, torsion_sigma, n_t)
        b[:3] += rng.normal(0.0, translate_sigma, 3)
        poses[p] = bat_to_xyz(b, zmatrix, primary)
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=4096)
    ap.add_argument("--spacing", type=float, default=0.025)
    ap.add_argument("--data", default="/root/reference/python/prmtopcrd")
    ap.add_argument("--streamed", action="store_true",
                    help="also score out-of-core: grids written to tiled "
                         "files, poses grouped by region via "
                         "StreamedGridEvaluator.evaluate_batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import openmmgridforce_tpu as og
    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import (GridBinding, load_inpcrd,
                                        load_prmtop, potential_energy,
                                        system_from_amber)
    from openmmgridforce_tpu.ops import gridgen
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    from openmmgridforce_tpu.sampling import build_zmatrix

    rec = load_prmtop(f"{args.data}/receptor.prmtop")
    rec_crd = load_inpcrd(f"{args.data}/receptor.trans.inpcrd")
    lig = load_prmtop(f"{args.data}/ligand.prmtop")
    lig_crd = load_inpcrd(f"{args.data}/ligand.trans.inpcrd")

    lo = lig_crd.min(0) - 0.8
    counts = tuple(int(c) + 1 for c in
                   np.ceil((lig_crd.max(0) + 0.8 - lo) / args.spacing))
    print(f"grids {counts} from {rec.natom} receptor atoms", flush=True)

    t0 = time.time()
    packs, scals, raw_grids = [], [], []
    for gt in ["charge", "ljr", "lja"]:
        g = gridgen.generate_grid(
            counts, (args.spacing,) * 3, lo, gt, rec_crd, rec.charges,
            rec.sigmas, rec.epsilons,
            interp_method=InterpolationMethod.BSPLINE,
            backend="pallas" if jax.default_backend() != "cpu" else "jnp")
        raw_grids.append(g)
        packs.append(pack_grid(g))
        scals.append(np.asarray(gridgen.auto_scaling_factors(
            gt, lig.charges, lig.sigmas, lig.epsilons)))
    multi = combine_packed_grids(packs)
    binding = GridBinding(grid=multi,
                          scaling=jnp.asarray(np.stack(scals), jnp.float32))
    print(f"generated + packed in {time.time() - t0:.1f}s", flush=True)

    system = system_from_amber(lig, dtype=jnp.float32)
    z, primary = build_zmatrix(lig.masses, [tuple(b) for b in lig.bond_idx])
    rng = np.random.default_rng(0)
    poses = random_poses(rng, lig_crd, z, primary, args.poses)

    score = jax.jit(lambda p, s, b: jax.vmap(
        lambda x: potential_energy(s, [b], x))(p))
    e = jax.block_until_ready(
        score(jnp.asarray(poses), system, binding))  # compile
    t0 = time.time()
    e = jax.block_until_ready(score(jnp.asarray(poses), system, binding))
    dt = time.time() - t0
    e = np.asarray(e)

    order = np.argsort(e)
    print(f"scored {args.poses} poses in {dt * 1e3:.1f} ms "
          f"({args.poses / dt:,.0f} poses/s)")
    print("top 5 poses (kJ/mol):",
          np.array2string(e[order[:5]], precision=2))
    print(f"crystal pose energy: "
          f"{float(potential_energy(system, [binding], jnp.asarray(lig_crd, jnp.float32))):.2f}")

    if args.streamed:
        # out-of-core variant: the SAME screen with the grids on disk
        # (OMGTILE), poses grouped by lattice-aligned region — the
        # scattered-cloud analogue of the reference's tiled kernel
        import tempfile

        from openmmgridforce_tpu.io import write_grid_tiled
        from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator

        tdir = tempfile.mkdtemp(prefix="screen_tiles_")
        evs = []
        for gt, g in zip(["charge", "ljr", "lja"], raw_grids):
            path = os.path.join(tdir, f"{gt}.tiled")
            write_grid_tiled(path, g, tile_size=32)
            evs.append(StreamedGridEvaluator(
                path, InterpolationMethod.BSPLINE))
        from openmmgridforce_tpu.mm import grid_energy

        def grids_streamed():
            eg = np.zeros(args.poses)
            for ev, scal in zip(evs, scals):
                eg = eg + np.asarray(
                    ev.evaluate_batch(poses, scal).energy)
            return eg
        eg_s = grids_streamed()             # compile + first region reads
        t0 = time.time()
        eg_s = grids_streamed()             # warm: device-LRU regions
        dt_s = time.time() - t0
        # parity on the GRID term (the part streaming replaces), over
        # fully-in-box poses: the intra term of violently clashing
        # random poses reaches 1e11 kJ/mol and an out-of-box atom draws
        # ONE fused restraint in-memory but one per grid file here
        # (documented fused-OOB divergence, COVERAGE.md). The max is
        # f32-position-quantization bound: the region-local frame
        # rounds (x - origin) differently by ~1e-7, and clashing atoms
        # sit on walls with |dE/dx| ~ 1e6 kJ/mol/nm, so ~1e-5 nm of
        # frame quantization reads as a few kJ/mol there (equivalent
        # position noise far below thermal).
        eg_m = np.asarray(jax.jit(jax.vmap(
            lambda x: grid_energy([binding], x)))(jnp.asarray(poses)))
        hi = lo + (np.asarray(counts) - 1) * args.spacing
        in_box = np.all((poses >= lo) & (poses <= hi), axis=(1, 2))
        rel = (np.abs(eg_s - eg_m)[in_box]
               / np.maximum(np.abs(eg_m[in_box]), 1.0))
        print(f"streamed (out-of-core): {args.poses / dt_s:,.0f} poses/s "
              f"warm; grid-energy rel |dE| vs in-memory median "
              f"{np.median(rel):.1e} / max {rel.max():.1e} over "
              f"{int(in_box.sum())}/{args.poses} in-box poses; "
              f"region hits/misses "
              f"{sum(ev.region_hits for ev in evs)}/"
              f"{sum(ev.region_misses for ev in evs)}")


if __name__ == "__main__":
    main()
