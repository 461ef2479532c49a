#!/usr/bin/env python
"""Method-matrix benchmark on the real TPU: steps/s + atom-evals/s for
every interpolation method and representation, plus constraints-on and
r-RESPA variants.

The headline (driver) benchmark stays bench.py; this publishes the full
matrix to BENCH_MATRIX.md (VERDICT round-1 item 4).

Config: 1000 vmapped replicas of the 47-atom ligand on the real 9133-atom
receptor's charge/ljr/lja fields. B-spline rows use the 0.025 nm value
grids (1.7M pts, bench.py's cache); Hermite rows (tricubic/triquintic)
use 0.05 nm 27-derivative grids — derivative storage is 27x values and
the per-step cost is resolution-independent (one row gather per atom),
so the coarser table measures the same kernel.

BENCH_SMOKE=1 shrinks everything for a CPU smoke test.
"""

import json
import os
import sys
import time

import numpy as np

SMOKE = bool(os.environ.get("BENCH_SMOKE"))
HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/python/prmtopcrd"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_ligand_system(dtype, constraints=None):
    from openmmgridforce_tpu.mm import (load_inpcrd, load_prmtop,
                                        system_from_amber)

    lig = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(lig, dtype=dtype, hydrogen_mass=4.0,
                              constraints=constraints)
    return lig, crd, system


def value_grids(counts, spacing, lo, dtype):
    """charge/ljr/lja value-only fields (cached, shared with bench.py)."""
    import jax.numpy as jnp

    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    from openmmgridforce_tpu.ops import gridgen

    cache = os.path.join(HERE, ".bench_grids.npz")
    if not SMOKE and os.path.exists(cache):
        z = np.load(cache)
        if tuple(z["counts"]) == counts:
            log("loaded cached value grids")
            return {gt: z[gt] for gt in ["charge", "ljr", "lja"]}
    rec = load_prmtop(f"{DATA}/receptor.prmtop")
    rc = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
    out = {}
    t0 = time.time()
    for gt in ["charge", "ljr", "lja"]:
        g = gridgen.generate_grid(counts, spacing, lo, gt, rc,
                                  rec.charges, rec.sigmas, rec.epsilons,
                                  dtype=jnp.float32)
        out[gt] = np.asarray(g.vals)
    log(f"value grids {counts}: {time.time()-t0:.1f}s")
    if not SMOKE:
        np.savez(cache, counts=np.asarray(counts), **out)
    return out


def deriv_grids(counts, spacing, lo, backend):
    """27-derivative fields for the Hermite methods (cached)."""
    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    from openmmgridforce_tpu.ops import gridgen

    cache = os.path.join(HERE, ".bench_grids_derivs.npz")
    if not SMOKE and os.path.exists(cache):
        z = np.load(cache)
        if tuple(z["counts"]) == counts:
            log("loaded cached derivative grids")
            return {gt: z[gt] for gt in ["charge", "ljr", "lja"]}
    rec = load_prmtop(f"{DATA}/receptor.prmtop")
    rc = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
    out = {}
    t0 = time.time()
    for gt in ["charge", "ljr", "lja"]:
        g = gridgen.generate_grid(counts, spacing, lo, gt, rc,
                                  rec.charges, rec.sigmas, rec.epsilons,
                                  compute_derivatives=True,
                                  backend=backend, dtype=np.float32)
        out[gt] = np.asarray(g.derivs)    # [nx,ny,nz,27]
    log(f"derivative grids {counts}: {time.time()-t0:.1f}s")
    if not SMOKE:
        np.savez(cache, counts=np.asarray(counts), **out)
    return out


def time_runner(run, states, system, bindings, temps, n_steps):
    import jax

    states = jax.block_until_ready(run(states, system, bindings, temps))
    t0 = time.time()
    jax.block_until_ready(run(states, system, bindings, temps))
    return n_steps / (time.time() - t0)


def main():
    import jax

    import jax.numpy as jnp

    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import GridBinding, make_md_runner
    from openmmgridforce_tpu.mm.integrators import (
        make_respa_langevin_step, run_respa_segment, run_segment)
    from openmmgridforce_tpu.mm.system import (_eval_grid,
                                               energy_and_forces)
    from openmmgridforce_tpu.ops import gridgen
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid,
                                                pack_grid_hermite)
    from openmmgridforce_tpu.parallel import init_replica_states

    dev = jax.devices()[0]
    n_replicas = 8 if SMOKE else int(os.environ.get("BENCH_REPLICAS",
                                                    "1000"))
    n_steps = 20 if SMOKE else int(os.environ.get("BENCH_STEPS", "1000"))
    dtype = jnp.float32
    log(f"device {dev}; {n_replicas} replicas, {n_steps} timed steps")

    lig, crd, system = load_ligand_system(dtype)
    _, _, system_hb = load_ligand_system(dtype, constraints="HBonds")
    lo = crd.min(0) - 1.0
    if SMOKE:
        sp_v = (0.2,) * 3
        sp_d = (0.25,) * 3
    else:
        sp_v = (0.025,) * 3
        # Hermite rows at the SAME resolution as the value rows so the
        # rows are comparable (VERDICT r2 item 7). 27-derivative storage
        # is 28x a value grid (27 derivs + values) — at 0.025 nm that is
        # ~181 MB/grid raw and ~4.4 GB for the fused triquintic pack.
        sp_d = (float(os.environ.get("BENCH_DERIV_SPACING", "0.025")),) * 3
    counts_v = tuple(int(c) + 1 for c in
                     np.ceil((crd.max(0) + 1.0 - lo) / sp_v))
    counts_d = tuple(int(c) + 1 for c in
                     np.ceil((crd.max(0) + 1.0 - lo) / sp_d))

    vals = value_grids(counts_v, sp_v, lo, dtype)
    derivs = deriv_grids(counts_d, sp_d, lo,
                         backend=("jnp" if SMOKE else "pallas"))

    scalings = {gt: np.asarray(gridgen.auto_scaling_factors(
        gt, lig.charges, lig.sigmas, lig.epsilons))
        for gt in ["charge", "ljr", "lja"]}
    stack_scal = jnp.asarray(np.stack([scalings[gt] for gt in
                                       ["charge", "ljr", "lja"]]), dtype)

    def grids_v(method):
        return [Grid.create(vals[gt], sp_v, lo, interp_method=method,
                            dtype=dtype) for gt in ["charge", "ljr", "lja"]]

    def grids_d(method):
        return [Grid.create(derivs[gt][..., 0], sp_d, lo,
                            derivs=derivs[gt], interp_method=method,
                            dtype=dtype) for gt in ["charge", "ljr", "lja"]]

    states0 = init_replica_states(
        jax.random.PRNGKey(0), jnp.asarray(crd, dtype), system.masses,
        300.0, n_replicas)
    temps = jnp.full((n_replicas,), 300.0, dtype)
    n_atoms = crd.shape[0]

    def respa_runner(n_outer, n_inner):
        def run(states, system, grids, temperatures):
            def one(state, t):
                def slow(x):
                    f = jnp.zeros_like(x)
                    for gb in grids:
                        f = f + _eval_grid(gb.grid, x, gb.scaling).forces
                    return f

                def fast(x):
                    return energy_and_forces(system, [], x)[1]

                step = make_respa_langevin_step(
                    slow, fast, system.masses, 0.001 * n_inner, n_inner,
                    5.0, t, constraints=system.constraints)
                return run_respa_segment(step, slow, state, n_outer)
            return jax.vmap(one)(states, temperatures)
        return jax.jit(run)

    rows = []

    def bench(name, sys_, bindings, n_grids, runner=None, steps=None,
              note=""):
        steps = steps or n_steps
        run = runner or make_md_runner(steps, dt=0.001, friction=5.0)
        t0 = time.time()
        v = time_runner(run, states0, sys_, bindings, temps, steps)
        evals = v * n_replicas * n_atoms * n_grids
        log(f"{name}: {v:,.1f} steps/s ({evals/1e6:,.1f}M atom-evals/s) "
            f"[{time.time()-t0:.0f}s incl compile] {note}")
        rows.append((name, v, evals, note))
        return v

    # BENCH_ONLY=hermite re-runs just the Hermite section (e.g. after a
    # derivative-resolution change); rows then publish to
    # BENCH_MATRIX_PARTIAL.md for manual merging instead of overwriting
    # the full matrix.
    only = os.environ.get("BENCH_ONLY", "")

    # slow rows get shorter dispatches: at >30 ms/step the RTT share
    # is negligible and the tunnel kills ~minute-long single dispatches
    slow = min(200, n_steps)

    # --- B-spline (0.025 nm values) ------------------------------------
    def bspline_section():
        bsp = grids_v(InterpolationMethod.BSPLINE)
        multi_b = combine_packed_grids([pack_grid(g) for g in bsp])
        fused = [GridBinding(grid=multi_b, scaling=stack_scal)]
        bench("bspline packed+fused", system, fused, 3)
        bench("bspline packed+fused, HBonds(SHAKE/RATTLE)", system_hb,
              fused, 3)
        bench("bspline packed+fused, r-RESPA(4x1fs)", system, fused, 3,
              runner=respa_runner(n_steps // 4, 4), steps=n_steps // 4,
              note="outer steps; grid kicked 4x less often")
        bench("bspline direct (reference layout, 64-pt stencil)", system,
              [GridBinding(grid=g,
                           scaling=jnp.asarray(scalings[gt], dtype))
               for g, gt in zip(bsp, ["charge", "ljr", "lja"])], 3,
              steps=slow)
        # out-of-core row: a 4x-bigger B-spline grid set (2.5 nm margin —
        # the regime streaming exists for: grid >> cloud wander range)
        # streamed from OMGTILE files, regions packed on read
        # (mm.StreamedBatchMD)
        import tempfile

        from openmmgridforce_tpu.io import write_grid_tiled
        from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
        from openmmgridforce_tpu.mm import (StreamedBatchMD, load_inpcrd,
                                            load_prmtop)
        tdir = tempfile.mkdtemp(prefix="benchmatrix_tiles_")
        s_margin = 0.4 if SMOKE else 2.5
        s_lo = crd.min(0) - s_margin
        s_counts = tuple(int(c) + 1 for c in np.ceil(
            (crd.max(0) + s_margin - s_lo) / sp_v))
        srec = load_prmtop(f"{DATA}/receptor.prmtop")
        srec_crd = load_inpcrd(f"{DATA}/receptor.trans.inpcrd")
        evs = []
        for gt in ["charge", "ljr", "lja"]:
            sg = gridgen.generate_grid(
                s_counts, sp_v, tuple(s_lo), gt, srec_crd,
                srec.charges, srec.sigmas, srec.epsilons,
                interp_method=InterpolationMethod.BSPLINE,
                backend="jnp" if SMOKE else "pallas",
                dtype=dtype)
            p = os.path.join(tdir, f"{gt}.tiled")
            write_grid_tiled(p, sg, tile_size=32)
            del sg
            evs.append(StreamedGridEvaluator(
                p, InterpolationMethod.BSPLINE,
                region_shape=(128, 128, 128)))
        try:
            # dt=0.5 fs: per-step cost is dt-independent, but the
            # streamed path VALIDATES region containment each segment
            # and a rare dt=1fs fusion blowup (one atom at ~80 nm/ps —
            # the in-memory rows silently tolerate it) would abort the
            # row
            smd = StreamedBatchMD(
                evs, [scalings[gt] for gt in ["charge", "ljr", "lja"]],
                system, dt=0.0005, friction=5.0, refresh_steps=200)
            t0 = time.time()
            st = smd.run(states0, temps, 400)  # warm: compiles + regions
            jax.block_until_ready(st.positions)
            t1 = time.time()
            st = smd.run(st, temps, 1000)
            jax.block_until_ready(st.positions)
            v = 1000 / (time.time() - t1)
            name = ("bspline streamed out-of-core (packed regions, "
                    "200-step segments)")
            evals = v * n_replicas * n_atoms * 3
            log(f"{name}: {v:,.1f} steps/s ({evals/1e6:,.1f}M "
                f"atom-evals/s) [{time.time()-t0:.0f}s incl compile]")
            rows.append((name, v, evals,
                         "4.2x-bigger grid on disk; dt=0.5fs (validated "
                         "containment)"))
        except RuntimeError as e:    # region crossing (charge fusion)
            log(f"streamed row skipped: {e}")
        for ev in evs:
            ev.close()

    if only in ("", "bspline"):
        bspline_section()

    # --- Hermite methods (sp_d, 27 derivatives) ------------------------
    for method, mname in (() if only not in ("", "hermite") else
                          ((InterpolationMethod.TRICUBIC, "tricubic"),
                           (InterpolationMethod.TRIQUINTIC,
                            "triquintic"))):
        gd = grids_d(method)
        packs = [pack_grid(g) for g in gd]
        multi = combine_packed_grids(packs)
        bench(f"{mname} monomial-packed+fused", system,
              [GridBinding(grid=multi, scaling=stack_scal)], 3)
        del multi, packs
        cmulti = combine_packed_grids(
            [pack_grid(g, poly_basis="chebyshev") for g in gd])
        bench(f"{mname} chebyshev-packed+fused (f32-accurate)", system,
              [GridBinding(grid=cmulti, scaling=stack_scal)], 3)
        del cmulti
        hps = [pack_grid_hermite(g) for g in gd]
        bench(f"{mname} hermite-packed (f32-accurate)", system,
              [GridBinding(grid=hp, scaling=jnp.asarray(scalings[gt],
                                                        dtype))
               for hp, gt in zip(hps, ["charge", "ljr", "lja"])], 3,
              steps=slow)
        from openmmgridforce_tpu.ops.packed import combine_hermite_packed
        hmulti = combine_hermite_packed(hps)
        bench(f"{mname} hermite-packed+fused (f32-accurate)", system,
              [GridBinding(grid=hmulti, scaling=stack_scal)], 3)
        del hps, hmulti
        bench(f"{mname} direct Hermite (8-corner gather)", system,
              [GridBinding(grid=g, scaling=jnp.asarray(scalings[gt],
                                                       dtype))
               for g, gt in zip(gd, ["charge", "ljr", "lja"])], 3,
              steps=slow)
        del gd

    # --- publish ---------------------------------------------------------
    out = os.path.join(HERE, "BENCH_MATRIX_PARTIAL.md" if only
                       else "BENCH_MATRIX.md")
    with open(out, "w") as fh:
        fh.write("# Method-matrix benchmark (real TPU)\n\n")
        fh.write(f"Device: {dev}. {n_replicas} replicas x {n_atoms} "
                 f"atoms, classic Langevin dt=1 fs, "
                 f"{n_steps} timed steps (in-scan).\n"
                 f"B-spline rows: 0.025 nm value grids "
                 f"({np.prod(counts_v):,} pts). Hermite rows: "
                 f"{sp_d[0]} nm 27-derivative grids "
                 f"({np.prod(counts_d):,} pts; 28x a value grid's "
                 f"bytes at equal resolution).\n\n")
        fh.write("| configuration | MD steps/s/chip | grid atom-evals/s "
                 "| note |\n|---|---|---|---|\n")
        for name, v, evals, note in rows:
            fh.write(f"| {name} | {v:,.1f} | {evals/1e6:,.1f}M | {note} "
                     "|\n")
    log(f"wrote {out}")
    print(json.dumps({r[0]: round(r[1], 1) for r in rows}))


if __name__ == "__main__":
    main()
