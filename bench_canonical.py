#!/usr/bin/env python
"""Canonical- and stress-scale campaign: run the engine at the
REFERENCE'S OWN grid scales and publish the numbers.

- canonical: the host-guest binding-site box, 208x278x231 points at
  0.0125 nm (13.36M pts/grid) — the grid of the reference's core
  accuracy suite (/root/reference/python/tests/test_simple_grid_energy
  .py:29-31 and every test_{bspline,tricubic,triquintic}.py).
- stress: 520x695x578 points at 0.005 nm (~208.9M pts/grid), tiled on
  disk — the reference's tiled streaming stress test
  (test_bspline_tiled_highres.py:46-57).

Stages are subcommands so each long step can run (and restart)
independently; results append JSON lines to BENCH_CANONICAL.jsonl and
the table in BENCH_MATRIX.md is updated by hand from there.

    python bench_canonical.py gen          # TPU: canonical value grids
    python bench_canonical.py parity       # CPU f64 pairwise oracle gate
    python bench_canonical.py md [--fuse auto|all|pair|none|streamed]
    python bench_canonical.py derivs       # TPU: 27-derivative grids
    python bench_canonical.py accuracy     # f32 cheb-packed vs f64 truth
    python bench_canonical.py hermite [--method tricubic|triquintic]
    python bench_canonical.py stress-gen   # TPU -> ~2.5 GB tiled files
    python bench_canonical.py stress-md    # streamed MD on 209M pts
"""

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# kill -USR1 <pid> dumps all thread stacks to stderr without touching
# the process (SIGQUIT kills python AND wedges the TPU tunnel for
# ~30+ min when transfers are in flight — never use it to inspect)
faulthandler.register(signal.SIGUSR1)

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/python/prmtopcrd"
OUT = os.path.join(HERE, "BENCH_CANONICAL.jsonl")

# reference canonical box (test_simple_grid_energy.py:29-31)
ORIGIN = (1.00175115, 0.5328844699999999, 0.8606374500000002)
SPACING = (0.0125, 0.0125, 0.0125)
COUNTS = (208, 278, 231)
# reference stress box (test_bspline_tiled_highres.py:46-57)
S_SPACING = (0.005, 0.005, 0.005)
S_COUNTS = (520, 695, 578)

GRID_TYPES = ["charge", "ljr", "lja"]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(row):
    row = dict(row)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _drop_big_device_buffers(threshold=1 << 28):
    """Delete every live device array over ``threshold`` bytes.

    Used between fusion-strategy attempts: a failed attempt's multi-GB
    packs otherwise stay resident (locals in the raised-through frames
    pin them while the handler runs, and module-level jit caches can
    keep donated aliases alive) and the retry OOMs on its first pack."""
    import gc

    import jax
    gc.collect()
    for buf in jax.live_arrays():
        try:
            if buf.nbytes > threshold:
                buf.delete()
        except Exception:
            pass


def load_amber():
    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    lig_x = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    rec = load_prmtop(f"{DATA}/receptor.prmtop")
    rec_x = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
    return lig, lig_x, rec, rec_x


def vals_cache(gt):
    return os.path.join(HERE, f".bench_canonical_{gt}.npy")


def derivs_cache(gt):
    return os.path.join(HERE, f".bench_canonical_derivs_{gt}.npy")


def pairwise_energy(grid_type, lig, lig_x, rec, rec_x):
    """The reference oracle (test_simple_grid_energy.py:124-184): f64
    pairwise double sum with the grid's geometric-mean decomposition."""
    from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH
    d = np.linalg.norm(lig_x[:, None, :] - rec_x[None, :, :], axis=-1)
    if grid_type == "charge":
        return float((COULOMB_CONST
                      * np.outer(lig.charges, rec.charges) / d).sum())
    rmin_l = TWO_POW_ONE_SIXTH * lig.sigmas
    rmin_r = TWO_POW_ONE_SIXTH * rec.sigmas
    se = np.sqrt(np.outer(lig.epsilons, rec.epsilons))
    if grid_type == "ljr":
        return float((se * np.outer(rmin_l**6, rmin_r**6) / d**12).sum())
    return float((-2.0 * se * np.outer(rmin_l**3, rmin_r**3)
                  / d**6).sum())


def receptor_field(grid_type, rec, rec_x, pts):
    """f64 per-unit-ligand-scaling receptor field at points [N,3] — the
    quantity the grid stores BEFORE the tanh cap."""
    from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH
    d = np.linalg.norm(pts[:, None, :] - rec_x[None, :, :], axis=-1)
    rmin_r = TWO_POW_ONE_SIXTH * rec.sigmas
    if grid_type == "charge":
        return (COULOMB_CONST * rec.charges / d).sum(1)
    if grid_type == "ljr":
        return (np.sqrt(rec.epsilons) * rmin_r**6 / d**12).sum(1)
    # lja stores the -2 prefactor IN the field (radial.field_value);
    # the ligand scaling is +sqrt(eps)*rmin^3
    return (-2.0 * np.sqrt(rec.epsilons) * rmin_r**3 / d**6).sum(1)


def pairwise_energy_capped(grid_type, lig, lig_x, rec, rec_x):
    """The oracle the grid can actually match: the reference caps every
    stored value V = U_max*tanh(U/U_max) (gridGeneration.cu:342,
    U_max = 41840 kJ/mol), so ligand atoms whose field is within an
    order of magnitude of the cap (close LJ-repulsive contacts) see a
    deliberately reduced field. Raw-pairwise parity conflates that
    reference semantics with interpolation error; this oracle applies
    the same cap to the f64 analytic field (the lja sign convention
    keeps tanh odd, so attractive fields are equally handled)."""
    from openmmgridforce_tpu.units import DEFAULT_GRID_CAP
    U = receptor_field(grid_type, rec, rec_x, lig_x)
    V = DEFAULT_GRID_CAP * np.tanh(U / DEFAULT_GRID_CAP)
    return float((scaling_for(grid_type, lig) * V).sum())


def scaling_for(gt, lig):
    from openmmgridforce_tpu.ops import gridgen
    return np.asarray(gridgen.auto_scaling_factors(
        gt, lig.charges, lig.sigmas, lig.epsilons))


# ----------------------------------------------------------------------
# stages
# ----------------------------------------------------------------------

def stage_gen(args):
    import jax

    from openmmgridforce_tpu.ops import gridgen
    _, _, rec, rec_x = load_amber()
    dev = jax.devices()[0]
    log(f"canonical generation on {dev}")
    for gt in GRID_TYPES:
        path = vals_cache(gt)
        if os.path.exists(path) and not args.force:
            log(f"{gt}: cached")
            continue
        t0 = time.time()
        g = gridgen.generate_grid(COUNTS, SPACING, ORIGIN, gt, rec_x,
                                  rec.charges, rec.sigmas, rec.epsilons,
                                  backend=args.backend,
                                  dtype=np.float32)
        v = np.asarray(g.vals)
        dt = time.time() - t0
        # Warm re-run: same program shapes, so any jit/remote-compile
        # cost is excluded — this separates "first-shape compile" from
        # steady-state throughput (the r3 charge row's 350 s vs 12 s
        # mystery was exactly this ambiguity).
        t1 = time.time()
        g2 = gridgen.generate_grid(COUNTS, SPACING, ORIGIN, gt, rec_x,
                                   rec.charges, rec.sigmas, rec.epsilons,
                                   backend=args.backend,
                                   dtype=np.float32)
        np.asarray(g2.vals)
        dt_warm = time.time() - t1
        np.save(path, v)
        pts = int(np.prod(COUNTS))
        emit({"stage": "gen", "grid": gt, "points": pts,
              "seconds": round(dt, 2),
              "seconds_warm": round(dt_warm, 2),
              "compile_overhead_s": round(max(0.0, dt - dt_warm), 2),
              "device": str(dev),
              "backend": args.backend,
              "pair_evals_per_s": round(
                  pts * rec_x.shape[0] / dt_warm / 1e9, 1)})


def stage_parity(args):
    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.ops.interpolate import evaluate_grid
    lig, lig_x, rec, rec_x = load_amber()
    worst = 0.0
    for gt in GRID_TYPES:
        v = np.load(vals_cache(gt)).astype(np.float64)
        grid = Grid.create(v, SPACING, ORIGIN,
                           interp_method=InterpolationMethod.BSPLINE,
                           dtype=np.float64)
        res = evaluate_grid(grid, lig_x, scaling_for(gt, lig))
        e_grid = float(res.energy)
        e_pair = pairwise_energy(gt, lig, lig_x, rec, rec_x)
        e_cap = pairwise_energy_capped(gt, lig, lig_x, rec, rec_x)
        rel = abs(e_grid - e_pair) / abs(e_pair)
        worst = max(worst, rel)
        emit({"stage": "parity", "grid": gt, "e_grid": e_grid,
              "e_pairwise": e_pair, "rel_err": rel,
              "e_capped_oracle": e_cap,
              "rel_err_capped_oracle": abs(e_grid - e_cap) / abs(e_cap),
              "gate": 0.02, "pass": rel < 0.02})
    log(f"worst rel err {worst:.4%} (reference gate 2%)")


def _build_packs(dtype, fuse, method=None):
    """Canonical packed bindings under the requested fusion strategy.
    Returns (bindings, label)."""
    import jax.numpy as jnp

    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import GridBinding
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid,
                                                pack_grids_fused)
    method = method or InterpolationMethod.BSPLINE
    hermite = method in (InterpolationMethod.TRICUBIC,
                         InterpolationMethod.TRIQUINTIC)
    import jax
    lig, _, _, _ = load_amber()

    def one_pack(gt):
        if hermite:
            d = np.load(derivs_cache(gt), mmap_mode="r")
            grid = Grid.create(np.ascontiguousarray(d[0]), SPACING,
                               ORIGIN, derivs=np.moveaxis(d, 0, -1),
                               interp_method=method, dtype=dtype)
        else:
            grid = Grid.create(np.load(vals_cache(gt)), SPACING, ORIGIN,
                               interp_method=method, dtype=dtype)
        p = pack_grid(grid)
        jax.block_until_ready(p.coeffs)
        log(f"  packed {gt}: {p.coeffs.nbytes / 1e9:.2f} GB")
        return p

    if fuse == "all":
        groups = [[0, 1, 2]]
    elif fuse == "pair":
        groups = [[0, 1], [2]]
    else:
        groups = [[0], [1], [2]]
    # Device constraint (measured, see CLAUDE.md): any buffer REFERENCED
    # BY A COMPILED PROGRAM must stay under ~7.2 GB through the tunnel
    # (plain allocation works to 14 GB, but a jitted gather/op touching
    # a bigger table crashes the remote compiler). At canonical scale
    # one B-spline pack is 3.38 GB, so the charge+ljr pair fuses to
    # exactly 128 lanes / 6.75 GB (under the limit); the 3-grid fused
    # table (10.1 GB) is NOT usable in one piece.
    bindings = []
    for grp in groups:
        scal = np.stack([scaling_for(GRID_TYPES[i], lig) for i in grp])
        if len(grp) == 1:
            # a singleton binding uses the PackedGrid directly (no
            # 64->128 lane padding from combine)
            bindings.append(GridBinding(grid=one_pack(GRID_TYPES[grp[0]]),
                                        scaling=jnp.asarray(scal[0],
                                                            dtype)))
        elif not hermite:
            # direct fused assembly: HBM peak = fused table + one slab
            gs = [Grid.create(np.load(vals_cache(GRID_TYPES[i])),
                              SPACING, ORIGIN, interp_method=method,
                              dtype=dtype) for i in grp]
            multi = pack_grids_fused(gs, lane_pad=64)
            jax.block_until_ready(multi.coeffs)
            log(f"  fused pack ({len(grp)} grids): "
                f"{multi.coeffs.nbytes / 1e9:.2f} GB")
            del gs
            bindings.append(GridBinding(grid=multi,
                                        scaling=jnp.asarray(scal,
                                                            dtype)))
        else:
            # Hermite fused assembly, slab-wise straight into the fused
            # table (combine_packed_grids needs every singleton pack
            # PLUS the fused table resident — 13.5 GB for a canonical
            # tricubic pair, measured RESOURCE_EXHAUSTED on 16 GB v5e)
            gs = []
            for i in grp:
                d = np.load(derivs_cache(GRID_TYPES[i]), mmap_mode="r")
                gs.append(Grid.create(
                    np.ascontiguousarray(d[0]), SPACING, ORIGIN,
                    derivs=np.moveaxis(d, 0, -1),
                    interp_method=method, dtype=dtype))
            multi = pack_grids_fused(gs, lane_pad=64)
            jax.block_until_ready(multi.coeffs)
            del gs
            log(f"  fused hermite pack ({len(grp)} grids): "
                f"{multi.coeffs.nbytes / 1e9:.2f} GB")
            bindings.append(GridBinding(grid=multi,
                                        scaling=jnp.asarray(scal,
                                                            dtype)))
    return bindings, f"fuse={fuse}"


def _time_md(bindings, n_replicas, n_steps, dtype, dt_fs=1.0):
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu.mm import (load_inpcrd, load_prmtop,
                                        make_md_runner, system_from_amber)
    from openmmgridforce_tpu.parallel import init_replica_states
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(lig, dtype=dtype, hydrogen_mass=4.0)
    states = init_replica_states(jax.random.PRNGKey(0),
                                 jnp.asarray(crd, dtype), system.masses,
                                 300.0, n_replicas)
    run = make_md_runner(n_steps, dt=dt_fs * 1e-3, friction=5.0)
    temps = jnp.full((n_replicas,), 300.0, dtype)
    states = jax.block_until_ready(run(states, system, bindings, temps))
    t0 = time.time()
    states = jax.block_until_ready(run(states, system, bindings, temps))
    dt = time.time() - t0
    # Tail-tolerant finiteness (same rule as profile_headline): at the
    # canonical resolution ~1/1000 unconstrained replicas can hit a
    # capped-grid fusion spike and go non-finite; that is a physics
    # tail event, not an engine bug, so gate on <=1% bad replicas
    # instead of all-finite (measured r5: tricubic fuse=pair at dt=1 fs
    # failed the hard all-finite assert on exactly this tail).
    finite = np.isfinite(np.asarray(states.positions)).all(axis=(1, 2))
    n_bad = int((~finite).sum())
    if n_bad:
        log(f"  WARNING: {n_bad}/{n_replicas} replicas non-finite "
            f"after {2 * n_steps} steps at dt={dt_fs} fs")
    assert n_bad <= max(1, n_replicas // 100), \
        f"{n_bad} non-finite replicas - not a tail event"
    return n_steps / dt


def stage_md(args):
    import jax
    dtype = np.float32
    # 3-grid fusion (10.1 GB table) exceeds the ~7.2 GB compiled-buffer
    # limit; pair = charge+ljr fused (6.75 GB) + lja single
    order = ([args.fuse] if args.fuse != "auto" else ["pair", "none"])
    bindings = None
    for fuse in order:
        try:
            log(f"building packs ({fuse}) ...")
            del bindings      # free the previous attempt's tables
            bindings = None
            bindings, label = _build_packs(dtype, fuse)
            sps = _time_md(bindings, args.replicas, args.steps, dtype,
                           dt_fs=args.dt_fs)
            n_atoms = 47
            emit({"stage": "md", "method": "bspline", "fuse": fuse,
                  "replicas": args.replicas, "dt_fs": args.dt_fs,
                  "steps_per_s": round(sps, 1),
                  "atom_evals_per_s": round(
                      sps * args.replicas * n_atoms * 3 / 1e6, 1),
                  "grid_points": int(np.prod(COUNTS)),
                  "device": str(jax.devices()[0])})
            return
        except Exception as e:
            import traceback
            log(f"fuse={fuse} failed: {type(e).__name__}: "
                f"{str(e)[:300]}")
            log(traceback.format_exc())
            if args.fuse != "auto":
                raise
        # Outside the handler (exception tracebacks pin device buffers
        # while the except block runs — CLAUDE.md): drop everything the
        # failed attempt left alive before the next strategy, or its
        # multi-GB packs eat the HBM the retry needs (measured: the
        # fuse=none retry OOMed on the FIRST 3.4 GB pack after a
        # fuse=pair combine failure).
        _drop_big_device_buffers()
    raise SystemExit("all fusion strategies failed")


def stage_derivs(args):
    import jax

    from openmmgridforce_tpu import InterpolationMethod
    from openmmgridforce_tpu.ops import gridgen
    _, _, rec, rec_x = load_amber()
    dev = jax.devices()[0]
    for gt in GRID_TYPES:
        path = derivs_cache(gt)
        if os.path.exists(path) and not args.force:
            log(f"{gt}: cached")
            continue
        t0 = time.time()
        g = gridgen.generate_grid(
            COUNTS, SPACING, ORIGIN, gt, rec_x, rec.charges, rec.sigmas,
            rec.epsilons, compute_derivatives=True,
            interp_method=InterpolationMethod.TRIQUINTIC,
            backend=args.backend,
            dtype=np.float32)
        d = np.moveaxis(np.asarray(g.derivs), -1, 0)   # [27, nx, ny, nz]
        dt = time.time() - t0
        np.save(path, d)
        emit({"stage": "derivs", "grid": gt,
              "points": int(np.prod(COUNTS)), "seconds": round(dt, 2),
              "backend": args.backend,
              "device": str(dev)})


def stage_accuracy(args):
    """f32 Chebyshev-packed Hermite evaluation vs f64 direct truth on
    the REAL canonical receptor grids, probing shells around receptor
    cores (the steep capped-field case that broke monomial packing).
    Truth isolates packing/eval conditioning: both sides read the same
    generated f32 grid data, the truth side evaluating the direct
    Hermite stencil in float64."""
    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.ops.compensated import (evaluate_compensated,
                                                     pack_grid_compensated)
    from openmmgridforce_tpu.ops.interpolate import evaluate_grid
    from openmmgridforce_tpu.ops.packed import (evaluate_hermite_packed,
                                                evaluate_packed,
                                                pack_grid,
                                                pack_grid_hermite)
    rng = np.random.default_rng(11)
    _, lig_x, rec, rec_x = load_amber()
    origin = np.asarray(ORIGIN)
    corner = origin + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    # receptor atoms well inside the canonical box
    inner = rec_x[np.all((rec_x > origin + 0.35)
                         & (rec_x < corner - 0.35), axis=1)]
    cores = inner[rng.choice(len(inner), size=args.windows,
                             replace=False)]
    methods = {"tricubic": InterpolationMethod.TRICUBIC,
               "triquintic": InterpolationMethod.TRIQUINTIC}
    msel = [m for m in (getattr(args, "methods", "") or "").split(",")
            if m]
    if msel:
        methods = {k: v for k, v in methods.items() if k in msel}
    win = 40            # window half-extent in grid points (0.5 nm)
    grids = [g for g in (getattr(args, "grids", "") or "").split(",")
             if g] or GRID_TYPES
    for gt in grids:
        d27 = np.load(derivs_cache(gt), mmap_mode="r")
        for mname, method in methods.items():
            stats = {v: {"max_rel": 0.0, "scale": [], "pose": []}
                     for v in ("chebyshev-f32", "hermite-packed-f32",
                               "direct-f32", "compensated-df32")}
            for c in cores:
                ic = np.floor((c - origin) / np.asarray(SPACING)) \
                    .astype(int)
                lo = np.clip(ic - win, 0, np.asarray(COUNTS) - 1)
                hi = np.clip(ic + win, 0, np.asarray(COUNTS) - 1)
                sub = np.ascontiguousarray(
                    d27[:, lo[0]:hi[0] + 1, lo[1]:hi[1] + 1,
                        lo[2]:hi[2] + 1]).astype(np.float64)
                sub_origin = origin + lo * np.asarray(SPACING)
                g64 = Grid.create(sub[0], SPACING, sub_origin,
                                  derivs=np.moveaxis(sub, 0, -1),
                                  interp_method=method,
                                  dtype=np.float64)
                g32 = Grid.create(sub[0].astype(np.float32), SPACING,
                                  sub_origin,
                                  derivs=np.moveaxis(
                                      sub, 0, -1).astype(np.float32),
                                  interp_method=method,
                                  dtype=np.float32)
                # probe shells r in [0.12, 0.5] nm around the core,
                # clipped to the window interior
                u = rng.standard_normal((args.points, 3))
                u /= np.linalg.norm(u, axis=1, keepdims=True)
                r = rng.uniform(args.r_min, args.r_max,
                                (args.points, 1))
                pts = np.clip(c + u * r, sub_origin + 0.05,
                              sub_origin + (np.asarray(sub[0].shape) - 1)
                              * np.asarray(SPACING) - 0.05)
                ones = np.ones(len(pts))
                pts32 = pts.astype(np.float32)
                ones32 = ones.astype(np.float32)
                e64 = np.asarray(evaluate_grid(
                    g64, pts, ones).per_atom_energy)
                variants = {
                    "chebyshev-f32": np.asarray(evaluate_packed(
                        pack_grid(g32), pts32, ones32).per_atom_energy),
                    "hermite-packed-f32": np.asarray(
                        evaluate_hermite_packed(
                            pack_grid_hermite(g32), pts32,
                            ones32).per_atom_energy),
                    "direct-f32": np.asarray(evaluate_grid(
                        g32, pts32, ones32).per_atom_energy),
                    # the accuracy tier (ops/compensated.py): f64
                    # Chebyshev pack of the same f32-stored data into
                    # (hi|lo) f32 rows, double-word f32 evaluation;
                    # exact f64 geometry (the f32 Grid's rounded
                    # origin/spacing would shift the cell fraction by
                    # ~1e-7*t — the dominant error at t~80)
                    "compensated-df32": np.asarray(evaluate_compensated(
                        pack_grid_compensated(g32, origin=sub_origin,
                                              spacing=SPACING), pts,
                        ones).per_atom_energy, np.float64),
                }
                fscale = np.abs(e64).max()
                big = np.abs(e64) >= 0.01 * fscale
                poses = [rng.choice(len(pts), 47, replace=False)
                         for _ in range(32)]
                for v, e32 in variants.items():
                    err = np.abs(e32 - e64)
                    st = stats[v]
                    if big.any():
                        st["max_rel"] = max(
                            st["max_rel"],
                            float((err[big] / np.abs(e64[big])).max()))
                    st["scale"].append(float(err.max() / fscale))
                    # pose-level (the BASELINE-style metric): 47-atom
                    # clouds, total energy relative error
                    for sel in poses:
                        E64, E32 = e64[sel].sum(), e32[sel].sum()
                        den = max(abs(E64),
                                  0.01 * np.abs(e64[sel]).sum())
                        st["pose"].append(abs(E32 - E64) / den)
            for v, st in stats.items():
                pose_max = float(np.max(st["pose"]))
                emit({"stage": "accuracy", "grid": gt, "method": mname,
                      "variant": v, "windows": args.windows,
                      "shell_nm": [args.r_min, args.r_max],
                      "points_per_window": args.points,
                      "max_rel_pointwise": st["max_rel"],
                      "max_err_over_field_scale": float(
                          np.max(st["scale"])),
                      "pose_max_rel": pose_max,
                      "gate": 1e-5,
                      "pass": bool(st["max_rel"] < 1e-5
                                   and pose_max < 1e-5)})


def hermite_tiled_path(gt):
    return os.path.join(args_cache_dir(), f"canon_derivs_{gt}.tiled")


def _ensure_hermite_tiled(gt):
    """Canonical 27-derivative grid as an OMGTILE file, written host-side
    from the derivs .npy cache (no device transfer: uploading 1.4 GB
    through the ~6 MB/s tunnel would take hours)."""
    path = hermite_tiled_path(gt)
    if os.path.exists(path):
        return path
    from openmmgridforce_tpu.io.omgtile import (TiledGridWriter, num_tiles,
                                                tile_range)
    d = np.load(derivs_cache(gt), mmap_mode="r")       # [27, nx, ny, nz]
    t0 = time.time()
    with TiledGridWriter(path + ".tmp", COUNTS, SPACING, ORIGIN,
                         tile_size=32, has_derivatives=True) as w:
        ntx, nty, ntz = num_tiles(COUNTS, 32)
        for tx in range(ntx):
            for ty in range(nty):
                for tz in range(ntz):
                    x0, y0, z0, x1, y1, z1 = tile_range(COUNTS, 32,
                                                        tx, ty, tz)
                    sub = np.ascontiguousarray(
                        d[:, x0:x1, y0:y1, z0:z1])
                    w.write_tile(tx, ty, tz, sub[0], sub)
    os.replace(path + ".tmp", path)
    log(f"  wrote {path} ({os.path.getsize(path) / 1e9:.2f} GB, "
        f"{time.time() - t0:.0f}s)")
    return path


def _streamed_hermite_row(args, method, dtype):
    """Canonical-scale Hermite MD via streamed regions: a full-grid
    triquintic pack (13.19M cells x 768-lane fused rows = 40 GB) cannot
    be device-resident, but the ligand cloud only ever touches a region
    — one fused 3-grid region pack (~4.5 GB) serves all replicas through
    the union-sharing StreamedBatchMD engine."""
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
    from openmmgridforce_tpu.mm import (load_inpcrd, load_prmtop,
                                        system_from_amber)
    from openmmgridforce_tpu.mm.streamed_md import (StreamedBatchMD,
                                                    StreamSet)
    from openmmgridforce_tpu.parallel import init_replica_states
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    # region = ligand span + stencil halo + drift margin per side
    span = crd.max(0) - crd.min(0)
    need = np.ceil(span / np.asarray(SPACING)).astype(int) + 1 + 3
    rshape = tuple(int(n + 2 * args.margin) for n in need)
    ncells = int(np.prod(np.asarray(rshape) - 1))
    log(f"  streamed region {rshape} ({ncells / 1e6:.1f}M cells)")
    evs = [StreamedGridEvaluator(_ensure_hermite_tiled(gt), method,
                                 region_shape=rshape)
           for gt in GRID_TYPES]
    scals = [scaling_for(gt, lig) for gt in GRID_TYPES]
    kcoef = 216 if args.method == "triquintic" else 64
    row = -(-len(evs) * kcoef // 128) * 128
    # escalation payloads live in host RAM: 3 x 28-channel canonical
    # grids = 4.49 GB, so the default 4 GiB budget would silently
    # disable the runaway safety net
    sets = [StreamSet(evs, scals,
                      pack_budget_bytes=int(ncells * row * 4 * 1.5),
                      full_region_budget_bytes=8 << 30)]
    system = system_from_amber(lig, dtype=dtype, hydrogen_mass=4.0)
    states = init_replica_states(jax.random.PRNGKey(0),
                                 jnp.asarray(crd, dtype), system.masses,
                                 300.0, args.replicas)
    md = StreamedBatchMD(sets=sets, system=system, dt=args.dt_fs * 1e-3,
                         friction=5.0, refresh_steps=50)
    t0 = time.time()
    states = md.run(states, 300.0, 100)          # warm: compile + pack
    log(f"  warmup: {time.time() - t0:.1f}s")
    t0 = time.time()
    states = md.run(states, 300.0, args.steps)
    dt = time.time() - t0
    assert bool(jnp.isfinite(np.asarray(states.positions)).all())
    return args.steps / dt


def stage_hermite(args):
    import jax

    from openmmgridforce_tpu import InterpolationMethod
    dtype = np.float32
    bindings = None
    method = {"tricubic": InterpolationMethod.TRICUBIC,
              "triquintic": InterpolationMethod.TRIQUINTIC}[args.method]
    # triquintic rows cannot be device-resident at canonical scale (one
    # grid's packed rows = 13.19M cells x 256 lanes = 13.5 GB, over the
    # tunneled device's ~7.2 GB compiled-buffer limit even singly) —
    # stream regions instead
    # tricubic at canonical scale: a 3-grid fused table is 13.19M cells
    # x 192 lanes = 10.1 GB — always over the ~7.2 GB compiled-buffer
    # limit, so don't waste a remote-compile attempt on "all"
    for fuse in ([args.fuse] if args.fuse != "auto"
                 else (["pair", "none"]
                       if args.method == "tricubic" else ["streamed"])):
        try:
            if fuse == "streamed":
                log(f"streamed {args.method} regions ...")
                sps = _streamed_hermite_row(args, method, dtype)
            else:
                log(f"building {args.method} packs ({fuse}) ...")
                del bindings      # free the previous attempt's tables
                bindings = None
                bindings, label = _build_packs(dtype, fuse, method)
                sps = _time_md(bindings, args.replicas, args.steps,
                               dtype, dt_fs=args.dt_fs)
            emit({"stage": "md", "method": args.method,
                  "basis": "chebyshev-f32", "fuse": fuse,
                  "replicas": args.replicas, "dt_fs": args.dt_fs,
                  "steps_per_s": round(sps, 1),
                  "atom_evals_per_s": round(
                      sps * args.replicas * 47 * 3 / 1e6, 1),
                  "grid_points": int(np.prod(COUNTS)),
                  "device": str(jax.devices()[0])})
            return
        except Exception as e:
            import traceback
            log(f"fuse={fuse} failed: {type(e).__name__}: "
                f"{str(e)[:300]}")
            log(traceback.format_exc())
            if args.fuse != "auto":
                raise
        # Outside the handler (exception tracebacks pin device buffers
        # while the except block runs — CLAUDE.md): drop everything the
        # failed attempt left alive before the next strategy, or its
        # multi-GB packs eat the HBM the retry needs (measured: the
        # fuse=none retry OOMed on the FIRST 3.4 GB pack after a
        # fuse=pair combine failure).
        _drop_big_device_buffers()
    raise SystemExit("all fusion strategies failed")


def stress_path(gt, scale=1):
    suffix = "" if scale == 1 else f"_s{scale}"
    return os.path.join(args_cache_dir(), f"stress_{gt}{suffix}.tiled")


def stress_box(scale):
    """Stress box at the given reduction ``scale``.

    scale=1 is the reference stress box verbatim
    (test_bspline_tiled_highres.py:46-57). scale>1 keeps the 0.005 nm
    spacing — that is what makes it "stress": the capped wells are 2.5x
    steeper than canonical — but reduces counts by ``scale`` per axis
    and re-centers the box on the ligand cloud, so a representative
    stress-spacing MD (parity gate + fusion-trap drain + timed window)
    runs in minutes instead of the hours a full 209M-pt rebuild costs
    (which four machine restarts wiped this round). Reduced-box rows
    carry a ``scale`` field so they can never be mistaken for the
    full-scale number."""
    counts = tuple(int(np.ceil(c / scale)) for c in S_COUNTS)
    if scale == 1:
        return counts, ORIGIN
    from openmmgridforce_tpu.mm import load_inpcrd
    lig_x = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    center = (lig_x.min(0) + lig_x.max(0)) / 2.0
    extent = (np.asarray(counts) - 1) * np.asarray(S_SPACING)
    return counts, tuple(float(c) for c in center - extent / 2.0)


def args_cache_dir():
    d = os.path.join(HERE, ".bench_stress")
    os.makedirs(d, exist_ok=True)
    return d


def stage_stress_gen(args):
    import jax

    from openmmgridforce_tpu.ops.gridgen import generate_grid_to_tiled_file
    _, _, rec, rec_x = load_amber()
    dev = jax.devices()[0]
    counts, origin = stress_box(args.scale)
    pts = int(np.prod(counts))
    for gt in GRID_TYPES:
        path = stress_path(gt, args.scale)
        if os.path.exists(path) and not args.force:
            log(f"{gt}: cached ({os.path.getsize(path) / 1e9:.2f} GB)")
            continue
        t0 = time.time()
        last = [0.0]

        def progress(done, total):
            if time.time() - last[0] > 20:
                last[0] = time.time()
                log(f"  {gt}: {done}/{total} tiles")
        # generate to a temp name, rename on completion: an interrupted
        # run must never look like a cached grid
        generate_grid_to_tiled_file(
            path + ".tmp", counts, S_SPACING, origin, gt, rec_x,
            rec.charges, rec.sigmas, rec.epsilons, tile_size=32,
            compute_derivatives=False, progress=progress)
        os.replace(path + ".tmp", path)
        dt = time.time() - t0
        emit({"stage": "stress-gen", "grid": gt, "points": pts,
              "scale": args.scale, "seconds": round(dt, 2),
              "file_gb": round(os.path.getsize(path) / 1e9, 2),
              "pair_evals_per_s": round(pts * rec_x.shape[0] / dt / 1e9,
                                        1), "device": str(dev)})


def stage_stress_md(args):
    import jax
    import jax.numpy as jnp

    from openmmgridforce_tpu import InterpolationMethod
    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
    from openmmgridforce_tpu.mm import (StreamedBatchMD, load_inpcrd,
                                        load_prmtop, system_from_amber)
    from openmmgridforce_tpu.parallel import (init_replica_states,
                                              redraw_hot_velocities)
    dtype = np.float32
    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    counts, _ = stress_box(args.scale)
    if args.region > 0:
        rshape = (args.region,) * 3
    else:
        # auto-size: at 0.005 nm the ligand cloud alone spans ~(124,
        # 299, 181) cells, so regions are anisotropic — cloud extent
        # + B-spline halo (1+2) + ``margin`` cells of drift headroom
        # per side
        span = crd.max(0) - crd.min(0)
        need = np.ceil(span / np.asarray(S_SPACING)).astype(int) + 1 + 3
        rshape = tuple(int(n + 2 * args.margin) for n in need)
    if any(r > c for r, c in zip(rshape, counts)):
        raise SystemExit(
            f"region {rshape} exceeds the scale-{args.scale} grid "
            f"{counts}: the ligand cloud + halo + margin must fit "
            f"inside the box (reduce --margin or --scale; the cloud "
            f"alone needs scale <= 2)")
    log(f"region shape {rshape} "
        f"({np.prod(np.array(rshape) - 1) / 1e6:.1f}M cells)")
    evs = [StreamedGridEvaluator(stress_path(gt, args.scale),
                                 InterpolationMethod.BSPLINE,
                                 region_shape=rshape)
           for gt in GRID_TYPES]
    scals = [scaling_for(gt, lig) for gt in GRID_TYPES]

    if not args.skip_parity:
        # parity gate first (reference highres gates: <0.5% good, <2% ok)
        recp = load_prmtop(f"{DATA}/receptor.prmtop")
        rec_x = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
        for gt, ev in zip(GRID_TYPES, evs):
            e_grid = float(ev.evaluate(crd, scals[GRID_TYPES.index(gt)])
                           .energy)
            e_pair = pairwise_energy(gt, lig, crd, recp, rec_x)
            e_cap = pairwise_energy_capped(gt, lig, crd, recp, rec_x)
            rel = abs(e_grid - e_pair) / abs(e_pair)
            emit({"stage": "stress-parity", "grid": gt, "e_grid": e_grid,
                  "e_pairwise": e_pair, "rel_err": rel,
                  "e_capped_oracle": e_cap,
                  "rel_err_capped_oracle": abs(e_grid - e_cap)
                  / abs(e_cap),
                  "gate": 0.02, "pass": rel < 0.02})

    system = system_from_amber(lig, dtype=dtype, hydrogen_mass=4.0)
    states = init_replica_states(jax.random.PRNGKey(0),
                                 jnp.asarray(crd, dtype), system.masses,
                                 300.0, args.replicas)
    # HBM budget at stress scale: packs (~8.3 GB) + staging must fit
    # the chip (full-grid escalation payloads live in HOST RAM). The
    # raw-region device LRU must hold every concurrently-active group's
    # region (4 x ~44 MB x 3 evs = 0.53 GB): once replicas scatter into
    # several stable groups, the minority groups run direct-stencil on
    # these cached regions every segment — an LRU smaller than the
    # group count re-reads AND re-uploads ~130 MB per group per segment
    # (measured: 113 s segments and unreclaimable host RSS growth)
    for ev in evs:
        ev.device_regions = 4
        ev._cached = None      # drop any parity-stage region
    # two pair-fused sets instead of one 3-grid set: a 3-grid B-spline
    # row is 192 floats -> a ~8 GB fused table at this region size,
    # over the tunneled device's ~7.2 GB compiled-buffer limit; split
    # (charge+ljr | lja) gives 128- and 64-float rows (~5.5 + 2.8 GB).
    # Budget each set to hold exactly ONE resident pack (1.5x a pack):
    # a crossing-retry straggler then runs direct-stencil instead of
    # doubling a multi-GB pack footprint (HBM is 16 GB total).
    from openmmgridforce_tpu.mm.streamed_md import StreamSet
    ncells = int(np.prod(np.asarray(rshape) - 1))
    sets = [StreamSet(evs[:2], scals[:2],
                      pack_budget_bytes=int(ncells * 128 * 4 * 1.5)),
            StreamSet(evs[2:], scals[2:],
                      pack_budget_bytes=int(ncells * 64 * 4 * 1.5))]
    md = StreamedBatchMD(sets=sets, system=system,
                         dt=args.dt_fs * 1e-3, friction=5.0,
                         refresh_steps=args.refresh)

    def rss_gb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
        return -1.0

    seg_t = [time.time()]

    def progress(done, total):
        now = time.time()
        log(f"  seg {done}/{total}: {now - seg_t[0]:.1f}s "
            f"rss {rss_gb():.1f}GB "
            f"packs {[s.packs_built for s in sets]} "
            f"direct {[s.direct_builds for s in sets]} "
            f"esc {[s.full_escalations for s in sets]}")
        seg_t[0] = now

    t0 = time.time()
    states = md.run(states, 300.0, args.warm, progress=progress)
    log(f"warmup {args.warm} steps: {time.time() - t0:.1f}s")
    # Drain fusion-trapped replicas before timing: on capped grids a
    # trapped replica's bounded high-KE orbit outruns the region margin
    # every segment and the timed window measures containment churn
    # instead of streaming throughput (BENCH_MATRIX "stress-MD rerun
    # collapse"). Re-draw hot replicas' velocities, equilibrate, repeat.
    drained = 0
    for r in range(args.drain_rounds):
        states, n_hot = redraw_hot_velocities(
            states, system.masses, 300.0, args.drain_threshold_k)
        n_hot = int(n_hot)
        log(f"  drain round {r}: {n_hot} replicas re-thermalized")
        drained += n_hot
        if n_hot == 0:
            break
        t0 = time.time()
        states = md.run(states, 300.0, args.drain_steps,
                        progress=progress)
        log(f"  drain equilibration {args.drain_steps} steps: "
            f"{time.time() - t0:.1f}s")
    t0 = time.time()
    states = md.run(states, 300.0, args.steps, progress=progress)
    dt = time.time() - t0
    assert bool(jnp.isfinite(np.asarray(states.positions)).all())
    emit({"stage": "stress-md", "method": "bspline-streamed",
          "replicas": args.replicas, "region_shape": list(rshape),
          "refresh_steps": args.refresh, "dt_fs": args.dt_fs,
          "steps_per_s": round(args.steps / dt, 1),
          "packs_built": sum(s.packs_built for s in sets),
          "direct_builds": sum(s.direct_builds for s in sets),
          "full_escalations": sum(s.full_escalations for s in sets),
          "drain_redraws": drained,
          "host_rss_gb": round(rss_gb(), 1),
          "grid_points": int(np.prod(counts)), "scale": args.scale,
          "on_disk_gb": round(sum(os.path.getsize(stress_path(g,
                                                              args.scale))
                                  for g in GRID_TYPES) / 1e9, 2),
          "device": str(jax.devices()[0])})


def main():
    # A deep-but-legitimate Python recursion inside a canonical-scale
    # stage must fail with a stack we can read, not a 1000-frame cap
    # (the r5 streamed-triquintic row died with a bare RecursionError
    # and no traceback at the default limit)
    sys.setrecursionlimit(50000)
    # CPU stages (parity, accuracy) need the backend pinned BEFORE any
    # jax op (the tunneled TPU plugin otherwise claims the default
    # backend) and x64 for the f64 truth evaluations
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--force", action="store_true")
    g.add_argument("--backend", default="auto",
                   choices=["auto", "jnp", "pallas"])
    sub.add_parser("parity")
    m = sub.add_parser("md")
    m.add_argument("--fuse", default="auto",
                   choices=["auto", "all", "pair", "none"])
    m.add_argument("--replicas", type=int, default=1000)
    m.add_argument("--steps", type=int, default=1000)
    # the canonical grids resolve much deeper capped wells than the
    # 0.025 nm bench grids; dt=1 fs resonates in them (the known
    # charge-fusion explosion — same physics as the reference)
    m.add_argument("--dt-fs", type=float, default=0.5)
    d = sub.add_parser("derivs")
    d.add_argument("--force", action="store_true")
    d.add_argument("--backend", default="auto",
                   choices=["auto", "jnp", "pallas"])
    a = sub.add_parser("accuracy")
    a.add_argument("--grids", default="",
                   help="comma list (default: charge,ljr,lja)")
    a.add_argument("--methods", default="",
                   help="comma list (default: tricubic,triquintic)")
    a.add_argument("--windows", type=int, default=8)
    a.add_argument("--points", type=int, default=256)
    a.add_argument("--r-min", type=float, default=0.12)
    a.add_argument("--r-max", type=float, default=0.5)
    h = sub.add_parser("hermite")
    h.add_argument("--method", default="tricubic",
                   choices=["tricubic", "triquintic"])
    h.add_argument("--fuse", default="auto",
                   choices=["auto", "all", "pair", "none", "streamed"])
    h.add_argument("--replicas", type=int, default=1000)
    h.add_argument("--steps", type=int, default=1000)
    # streamed-row drift headroom: 1000 thermally-diverging replicas at
    # margin 16 fragmented the region pool and every re-pack pays a
    # ~440 MB raw-region upload through the tunnel (measured r5: the
    # timed run spent its whole budget rebuilding regions)
    h.add_argument("--margin", type=int, default=16)
    # same physics note as `md`: dt=1 fs resonates in the deep capped
    # wells the canonical resolution resolves
    h.add_argument("--dt-fs", type=float, default=0.5)
    sg = sub.add_parser("stress-gen")
    sg.add_argument("--force", action="store_true")
    sg.add_argument("--scale", type=int, default=1,
                    help="divide box counts by N (spacing stays 0.005 "
                         "nm, box re-centered on the ligand cloud); "
                         "rows carry a scale field")
    sm = sub.add_parser("stress-md")
    sm.add_argument("--scale", type=int, default=1,
                    help="use the scale-N reduced stress grids from "
                         "stress-gen --scale N")
    sm.add_argument("--replicas", type=int, default=100)
    sm.add_argument("--region", type=int, default=0,
                    help="cubic region edge; 0 = auto-size from the "
                         "ligand cloud + --margin")
    sm.add_argument("--margin", type=int, default=16)
    # dt=0.25 fs / refresh=50: at 0.005 nm the capped wells are 2.5x
    # steeper than canonical — dt=0.5 fs resonance-pumps fusion atoms
    # past 25 nm/ps, outrunning any affordable region margin. Cost per
    # step is dt-independent; segment drift tolerance is
    # margin*spacing/(refresh*dt) = 6.4 nm/ps (4x that in retry chunks).
    sm.add_argument("--skip-parity", action="store_true")
    sm.add_argument("--refresh", type=int, default=50)
    sm.add_argument("--warm", type=int, default=100)
    sm.add_argument("--steps", type=int, default=1000)
    sm.add_argument("--dt-fs", type=float, default=0.25)
    # fusion-trap drain before the timed window (0 rounds disables):
    # re-thermalize replicas hotter than --drain-threshold-k, run
    # --drain-steps more equilibration, repeat until none are hot
    sm.add_argument("--drain-rounds", type=int, default=10)
    sm.add_argument("--drain-steps", type=int, default=500)
    sm.add_argument("--drain-threshold-k", type=float, default=1000.0)
    args = p.parse_args()
    {"gen": stage_gen, "parity": stage_parity, "md": stage_md,
     "derivs": stage_derivs, "accuracy": stage_accuracy,
     "hermite": stage_hermite, "stress-gen": stage_stress_gen,
     "stress-md": stage_stress_md}[args.cmd](args)


if __name__ == "__main__":
    main()
