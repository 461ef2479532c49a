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
    packs, scals = [], []
    for gt in ["charge", "ljr", "lja"]:
        g = gridgen.generate_grid(
            counts, (args.spacing,) * 3, lo, gt, rec_crd, rec.charges,
            rec.sigmas, rec.epsilons,
            interp_method=InterpolationMethod.BSPLINE,
            backend="pallas" if jax.default_backend() != "cpu" else "jnp")
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


if __name__ == "__main__":
    main()
