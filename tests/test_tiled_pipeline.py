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

    # region reuse: the cloud barely moves, so most of the 4 segment
    # refreshes must hit the cached region (zero file I/O)
    streamer = next(i.streamer for i in ctx_str._grid_infos.values()
                    if i.streamer is not None)
    assert streamer.region_hits >= 2, (streamer.region_hits,
                                       streamer.region_misses)

    # minimizeEnergy must also work on the streamed path
    sim = gfp.Simulation(rec_top, ctx_str.system,
                         ctx_str.integrator)
    sim.context = ctx_str
    e0 = ctx_str.getState(getEnergy=True).getPotentialEnergy()
    sim.minimizeEnergy(maxIterations=30, tolerance=1.0)
    e1 = ctx_str.getState(getEnergy=True).getPotentialEnergy()
    assert e1 <= e0 + 1e-9
