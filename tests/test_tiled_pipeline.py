"""Tiled generate -> save -> stream-evaluate pipeline through the API
(mirror of reference python/tests/test_tiled_pipeline.py)."""

import numpy as np
import pytest

import openmmgridforce_tpu.api as gfp
from openmmgridforce_tpu.io import TiledGridReader
from openmmgridforce_tpu.ops import gridgen

RNG = np.random.default_rng(19)


def _fake_receptor(n):
    from tests.test_api import _synthetic_topology
    q = RNG.uniform(-0.4, 0.4, n)
    sig = RNG.uniform(0.25, 0.35, n)
    eps = RNG.uniform(0.2, 0.8, n)
    return _synthetic_topology(n, q, sig, eps), q, sig, eps


def test_generate_to_tiled_file_matches_in_memory(tmp_path):
    counts = (12, 11, 10)
    spacing = (0.08, 0.08, 0.08)
    origin = (0.0, 0.0, 0.0)
    n = 15
    pos = RNG.uniform(-0.2, 1.0, (n, 3))
    q = RNG.uniform(-0.5, 0.5, n)
    sig = RNG.uniform(0.25, 0.35, n)
    eps = RNG.uniform(0.2, 0.8, n)

    path = str(tmp_path / "gen.tiled")
    progress = []
    gridgen.generate_grid_to_tiled_file(
        path, counts, spacing, origin, "lja", pos, q, sig, eps,
        tile_size=4, compute_derivatives=True,
        progress=lambda d, t: progress.append((d, t)))
    assert progress[-1][0] == progress[-1][1]

    with TiledGridReader(path) as r:
        vals, derivs = r.read_full()
        assert r.has_derivatives

    ref = gridgen.generate_grid(counts, spacing, origin, "lja", pos, q,
                                sig, eps, compute_derivatives=True)
    np.testing.assert_allclose(vals, np.asarray(ref.vals), rtol=2e-5,
                               atol=1e-6)
    want_d = np.moveaxis(np.asarray(ref.derivs), -1, 0)
    np.testing.assert_allclose(derivs, want_d, rtol=2e-4, atol=2e-4)


def test_api_tiled_pipeline_end_to_end(tmp_path):
    """setTiledOutputFile + setTiledMode -> Context generates to file and
    evaluates by streaming; energies match the non-tiled path
    (reference test_tiled_pipeline.py:121 pattern)."""
    n_rec = 12
    rec_top, q, sig, eps = _fake_receptor(n_rec)
    rec_pos = RNG.uniform(0.0, 1.0, (n_rec, 3))
    counts = (14, 14, 14)
    spacing = 0.07

    def build(tiled, out_path=None):
        system = gfp.create_system(rec_top)
        g = gfp.GridForce()
        g.addGridCounts(*counts)
        g.addGridSpacing(spacing, spacing, spacing)
        g.setGridOrigin(0.0, 0.0, 0.0)
        g.setAutoGenerateGrid(True)
        g.setGridType("charge")
        g.setReceptorAtoms(list(range(n_rec)))
        g.setReceptorPositionsFromLists(rec_pos)
        g.setScalingFactors(q)  # receptor atoms as probes
        if tiled:
            g.setTiledOutputFile(out_path, 8)
            g.setTiledMode(True, tile_size=8)
        system.addForce(g)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.001))
        ctx.setPositions(rec_pos * 0.9 + 0.05)
        return ctx, g

    ctx_mem, _ = build(False)
    e_mem = ctx_mem.getState(getEnergy=True).getPotentialEnergy()

    out = str(tmp_path / "pipe.tiled")
    ctx_tiled, g_tiled = build(True, out)
    e_tiled = ctx_tiled.getState(getEnergy=True).getPotentialEnergy()

    assert g_tiled.getTiledInputFile() == out
    assert e_tiled == pytest.approx(e_mem, rel=2e-5, abs=1e-6)


def test_streamed_md_stepping_trajectory_parity(tmp_path):
    """MD stepping on a streamed (tiled-file) grid must produce the SAME
    trajectory as the in-memory grid: Verlet is deterministic, the region
    is exact within its interior, and the runner refreshes the region
    between jitted segments (reference tiled execute loop,
    CudaGridForceKernels.cpp:787-1028)."""
    n_rec = 12
    rec_top, q, sig, eps = _fake_receptor(n_rec)
    rec_pos = RNG.uniform(0.0, 1.0, (n_rec, 3))
    counts = (16, 16, 16)
    spacing = 0.07

    def build(tiled, out_path=None):
        system = gfp.create_system(rec_top)
        g = gfp.GridForce()
        g.addGridCounts(*counts)
        g.addGridSpacing(spacing, spacing, spacing)
        g.setGridOrigin(0.0, 0.0, 0.0)
        g.setAutoGenerateGrid(True)
        g.setGridType("charge")
        g.setReceptorAtoms(list(range(n_rec)))
        g.setReceptorPositionsFromLists(rec_pos)
        g.setScalingFactors(q * 0.05)
        if tiled:
            g.setTiledOutputFile(out_path, 8)
            g.setTiledMode(True, tile_size=8)
        system.addForce(g)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.0005))
        ctx.setPositions(rec_pos * 0.8 + 0.1)
        return ctx

    ctx_mem = build(False)
    ctx_str = build(True, str(tmp_path / "md.tiled"))
    ctx_str.stream_refresh_steps = 10   # force several region refreshes

    ctx_mem.getIntegrator().step(35)
    ctx_str.getIntegrator().step(35)
    # the tiled FILE stores float32 values while the in-memory grid is
    # float64, so trajectories agree to f32 grid precision, not bitwise
    # (observed max |dx| ~2e-9 nm after 35 steps)
    np.testing.assert_allclose(ctx_str.getPositions(),
                               ctx_mem.getPositions(),
                               rtol=1e-5, atol=1e-7)

    # region reuse: the cloud barely moves, so region hysteresis plus
    # the packed-region LRU must serve every segment after the first
    # from ONE region read (zero further file I/O)
    streamer = next(i.streamer for i in ctx_str._grid_infos.values()
                    if i.streamer is not None)
    assert streamer.region_misses == 1, (streamer.region_hits,
                                         streamer.region_misses)

    # minimizeEnergy must also work on the streamed path
    sim = gfp.Simulation(rec_top, ctx_str.system,
                         ctx_str.integrator)
    sim.context = ctx_str
    e0 = ctx_str.getState(getEnergy=True).getPotentialEnergy()
    sim.minimizeEnergy(maxIterations=30, tolerance=1.0)
    e1 = ctx_str.getState(getEnergy=True).getPotentialEnergy()
    assert e1 <= e0 + 1e-9


def test_context_minimize_escalates_oversized_cloud_on_host(tmp_path):
    """minimizeEnergy on a streamed grid whose configured region is
    SMALLER than the particle cloud: assignment escalates to the
    full-grid payload, which lives on the HOST CPU device and the
    minimization segment runs there (mm.streamed_md host-escalation
    semantics; a multi-GB full grid must never be uploaded to HBM).
    Energy must still go down and the escalation must be recorded."""
    n_rec = 12
    rec_top, q, sig, eps = _fake_receptor(n_rec)
    rec_pos = RNG.uniform(0.0, 1.0, (n_rec, 3))
    counts = (16, 16, 16)
    spacing = 0.07
    system = gfp.create_system(rec_top)
    g = gfp.GridForce()
    g.addGridCounts(*counts)
    g.addGridSpacing(spacing, spacing, spacing)
    g.setGridOrigin(0.0, 0.0, 0.0)
    g.setAutoGenerateGrid(True)
    g.setGridType("charge")
    g.setReceptorAtoms(list(range(n_rec)))
    g.setReceptorPositionsFromLists(rec_pos)
    g.setScalingFactors(q * 0.05)
    g.setTiledOutputFile(str(tmp_path / "esc.tiled"), 8)
    g.setTiledMode(True, tile_size=8)
    g.setStreamRegionShape(8, 8, 8)      # cloud spans ~13 cells: too big
    system.addForce(g)
    ctx = gfp.Context(system, gfp.VerletIntegrator(0.0005))
    ctx.setPositions(rec_pos * 0.8 + 0.1)
    e0 = ctx.getState(getEnergy=True).getPotentialEnergy()
    sim = gfp.Simulation(rec_top, ctx.system, ctx.integrator)
    sim.context = ctx
    sim.minimizeEnergy(maxIterations=20, tolerance=1.0)
    e1 = ctx.getState(getEnergy=True).getPotentialEnergy()
    assert e1 <= e0 + 1e-9
    assert any(s.full_escalations > 0
               for s in ctx._ensure_stream_engine().sets), \
        "oversized cloud must have escalated to the host full grid"


def test_context_streamed_detects_self_reversing_excursion(tmp_path):
    """Compat-API clone of
    test_streamed_batch_detects_self_reversing_excursion: Context
    streamed stepping DELEGATES to the batch engine (a Context is a
    batch of one), so a cloud that crosses its region mid-segment is
    still detected by the running in-scan bbox, not an endpoint-only
    check. The violator here (as in the batch test) is a ligand
    launched from outside the grid: the stiff full-box restraint
    slingshots it across the box faster than any region can follow."""
    from openmmgridforce_tpu.io import write_grid_tiled
    from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop
    from openmmgridforce_tpu.ops import gridgen

    data = "/root/reference/python/prmtopcrd"
    lig = load_prmtop(f"{data}/ligand.prmtop")
    lig_x = load_inpcrd(f"{data}/ligand.trans.inpcrd")
    lig_x = lig_x - lig_x.min(0)

    counts, spacing, origin = (33, 33, 33), (0.1,) * 3, (-0.8,) * 3
    rng = np.random.default_rng(31)
    rec = rng.uniform(-0.5, 2.2, (15, 3))
    q = rng.uniform(-0.2, 0.2, 15)

    system = gfp.create_system(lig)
    for gt in ["charge", "lja"]:
        grid = gridgen.generate_grid(
            counts, spacing, origin, gt, rec, q,
            np.full(15, 0.32), np.full(15, 0.4), dtype=np.float64)
        path = str(tmp_path / f"{gt}.tiled")
        write_grid_tiled(path, grid, tile_size=8)
        g = gfp.GridForce()
        g.setTiledInputFile(path)
        g.setInterpolationMethod(1)         # B-spline
        g.setStreamRegionShape(26, 26, 26)
        g.setScalingFactors(np.asarray(gridgen.auto_scaling_factors(
            gt, lig.charges, lig.sigmas, lig.epsilons)))
        system.addForce(g)

    ctx = gfp.Context(system, gfp.LangevinIntegrator(0.0, 0.2, 0.001))
    ctx.setPositions(lig_x + 4.0)           # fully outside the grid
    ctx.setVelocities(np.zeros_like(lig_x))
    ctx.stream_refresh_steps = 400
    # escalation off: the mid-segment excursion must RAISE
    ctx.stream_full_region_budget_bytes = 0
    with pytest.raises(RuntimeError, match="crossed their streamed"):
        ctx.getIntegrator().step(400)

    # escalation on (default): the same trajectory completes, with the
    # violator moved onto the full-grid payload
    ctx2 = gfp.Context(system, gfp.LangevinIntegrator(0.0, 0.2, 0.001))
    ctx2.setPositions(lig_x + 4.0)
    ctx2.setVelocities(np.zeros_like(lig_x))
    ctx2.stream_refresh_steps = 400
    ctx2.getIntegrator().step(400)
    eng = ctx2._ensure_stream_engine()
    assert any(s.full_escalations > 0 for s in eng.sets)
    pos = ctx2.getState(getPositions=True).getPositions(asNumpy=True)
    assert np.isfinite(np.asarray(pos)).all()


def test_evaluate_batch_scattered_replicas(tmp_path):
    """Scattered replica clouds over a big streamed grid: each replica
    only needs ITS cloud to fit one region (per-atom tile-lookup parity
    with the reference's gridForceTiled.cu), exact vs the in-memory
    full-grid kernel."""
    from openmmgridforce_tpu.grid import InterpolationMethod
    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
    from openmmgridforce_tpu.ops.interpolate import evaluate_grid

    counts = (40, 38, 36)
    spacing = (0.05, 0.05, 0.05)
    origin = (0.0, 0.0, 0.0)
    n_rec = 25
    rec = RNG.uniform(0.2, 1.6, (n_rec, 3))
    q = RNG.uniform(-0.5, 0.5, n_rec)
    sig = RNG.uniform(0.25, 0.35, n_rec)
    eps = RNG.uniform(0.2, 0.8, n_rec)

    path = str(tmp_path / "big.tiled")
    gridgen.generate_grid_to_tiled_file(
        path, counts, spacing, origin, "lja", rec, q, sig, eps,
        tile_size=8, compute_derivatives=True)
    full = gridgen.generate_grid(
        counts, spacing, origin, "lja", rec, q, sig, eps,
        compute_derivatives=True,
        interp_method=InterpolationMethod.TRICUBIC)

    ev = StreamedGridEvaluator(path, InterpolationMethod.TRICUBIC,
                               region_shape=(16, 16, 16))

    # 12 replicas x 6 atoms: tight clouds scattered across the box,
    # one near each far corner, one fully outside the grid
    n_rep, n_atoms = 12, 6
    sites = RNG.uniform(0.25, 1.6, (4, 3))
    centers = np.concatenate([
        # 10 replicas clustered around 4 sites (so distinct regions fit
        # the 8-entry device LRU), plus a far corner and one fully
        # outside the grid (restraint branch)
        sites[RNG.integers(0, 4, n_rep - 2)] + RNG.uniform(
            -0.05, 0.05, (n_rep - 2, 3)),
        [[1.85, 1.75, 1.65]],
        [[3.0, 3.0, 3.0]],
    ])
    pos = centers[:, None, :] + RNG.uniform(-0.07, 0.07,
                                            (n_rep, n_atoms, 3))
    scal = RNG.uniform(0.5, 1.5, n_atoms)

    got = ev.evaluate_batch(pos, scal)
    assert got.forces.shape == (n_rep, n_atoms, 3)
    # the combined cloud spans many regions: one-shot evaluate handles
    # it exactly via region-sized chunks (the reference's tiled
    # one-shot path prepares however many tiles the cloud spans)...
    flat = ev.evaluate(pos.reshape(-1, 3), np.tile(scal, n_rep))
    np.testing.assert_allclose(
        np.asarray(flat.per_atom_energy).reshape(n_rep, n_atoms),
        np.asarray(got.per_atom_energy), rtol=1e-5, atol=1e-6)
    # ...and a BATCH containing one replica whose own cloud exceeds a
    # region mixes the grouped fast path with chunked evaluation
    pos_mix = pos.copy()
    pos_mix[3] = pos.reshape(-1, 3)[
        RNG.choice(n_rep * n_atoms, n_atoms, replace=False)]
    got_mix = ev.evaluate_batch(pos_mix, scal)
    want3 = evaluate_grid(full, pos_mix[3], scal)
    np.testing.assert_allclose(np.asarray(got_mix.per_atom_energy[3]),
                               np.asarray(want3.per_atom_energy),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mix.per_atom_energy[5]),
                               np.asarray(got.per_atom_energy[5]),
                               rtol=1e-6, atol=1e-7)
    # ...and each replica matches the in-memory full-grid kernel
    # (tiled FILE stores f32 values -> f32-level agreement)
    for r in range(n_rep):
        want = evaluate_grid(full, pos[r], scal)
        np.testing.assert_allclose(np.asarray(got.per_atom_energy[r]),
                                   np.asarray(want.per_atom_energy),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.forces[r]),
                                   np.asarray(want.forces),
                                   rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(float(got.energy[r]),
                                   float(want.energy), rtol=1e-5)

    # distinct regions were read once each and are device-LRU-cached:
    # a second identical batch costs zero further region builds
    misses0 = ev.region_misses
    assert misses0 >= 3
    got2 = ev.evaluate_batch(pos, scal)
    assert ev.region_misses == misses0
    np.testing.assert_array_equal(np.asarray(got2.energy),
                                  np.asarray(got.energy))
    ev.close()
