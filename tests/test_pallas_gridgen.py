"""Pallas grid-generation kernel vs the jnp path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.ops import gridgen
from openmmgridforce_tpu.ops.pallas_gridgen import generate_grid_values_pallas

RNG = np.random.default_rng(53)


@pytest.mark.parametrize("grid_type", ["charge", "ljr", "lja"])
def test_pallas_gridgen_matches_jnp(grid_type):
    counts = (9, 10, 11)
    spacing = (0.1, 0.11, 0.09)
    origin = (0.0, -0.2, 0.3)
    A = 37
    pos = RNG.uniform(-0.3, 1.2, (A, 3))
    q = RNG.uniform(-1, 1, A)
    sig = RNG.uniform(0.2, 0.35, A)
    eps = RNG.uniform(0.1, 1.0, A)

    ref = np.asarray(gridgen.generate_grid(
        counts, spacing, origin, grid_type, pos, q, sig, eps,
        grid_cap=800.0, dtype=jnp.float32).vals)
    got = np.asarray(generate_grid_values_pallas(
        counts, spacing, origin, grid_type, pos, q, sig, eps, 800.0,
        interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_pallas_gridgen_capping_saturates():
    """A point right on top of an atom must cap exactly at grid_cap."""
    counts = (3, 3, 3)
    spacing = (0.1, 0.1, 0.1)
    origin = (0.0, 0.0, 0.0)
    pos = np.array([[0.1, 0.1, 0.1]])  # exactly on node (1,1,1)
    got = np.asarray(generate_grid_values_pallas(
        counts, spacing, origin, "ljr", pos, np.array([0.0]),
        np.array([0.3]), np.array([1.0]), 500.0, interpret=True))
    assert got[1, 1, 1] == pytest.approx(500.0)


@pytest.mark.parametrize("grid_type", ["charge", "ljr"])
def test_pallas_raw_derivs_match_jnp(grid_type):
    from openmmgridforce_tpu.ops import radial
    from openmmgridforce_tpu.ops.gridgen import grid_point_positions
    from openmmgridforce_tpu.ops.pallas_gridgen_derivs import (
        generate_raw_derivs_pallas)

    counts = (6, 7, 8)
    spacing = (0.1, 0.11, 0.09)
    origin = (0.0, -0.2, 0.3)
    A = 11
    pos = RNG.uniform(-0.3, 1.2, (A, 3)).astype(np.float32)
    q = RNG.uniform(-1, 1, A)
    sig = RNG.uniform(0.2, 0.35, A)
    eps = RNG.uniform(0.1, 1.0, A)

    got = np.asarray(generate_raw_derivs_pallas(
        counts, spacing, origin, grid_type, pos, q, sig, eps,
        interpret=True))

    # float64 ground truth; the float32 kernel must track it to f32 grade
    idx = jnp.arange(np.prod(counts))
    pts = grid_point_positions(counts, jnp.asarray(spacing, jnp.float64),
                               jnp.asarray(origin, jnp.float64), idx)
    dr = pts[:, None, :] - jnp.asarray(pos, jnp.float64)
    r2 = jnp.maximum(jnp.sum(dr * dr, -1), 4e-4)
    rad = radial.radial_derivatives(r2, grid_type,
                                    jnp.asarray(q, jnp.float64),
                                    jnp.asarray(sig, jnp.float64),
                                    jnp.asarray(eps, jnp.float64))
    want = np.asarray(jnp.sum(radial.radial_to_cartesian(dr, rad),
                              axis=1)).reshape(counts + (27,))
    scale = np.abs(want).max(axis=(0, 1, 2)) + 1e-30
    assert (np.abs(got - want) / scale).max() < 2e-4


def test_pallas_deriv_backend_end_to_end():
    """generate_grid(backend='pallas', compute_derivatives=True) matches
    the jnp pipeline (interpret mode)."""
    import openmmgridforce_tpu.ops.pallas_gridgen_derivs as pgd
    import openmmgridforce_tpu.ops.pallas_gridgen as pg
    from unittest import mock

    counts = (6, 6, 6)
    spacing = (0.1,) * 3
    origin = (0.0,) * 3
    A = 9
    pos = RNG.uniform(-0.2, 0.8, (A, 3))
    q = RNG.uniform(-0.5, 0.5, A)
    sig = RNG.uniform(0.25, 0.35, A)
    eps = RNG.uniform(0.2, 0.8, A)

    ref = gridgen.generate_grid(counts, spacing, origin, "lja", pos, q,
                                sig, eps, compute_derivatives=True,
                                dtype=jnp.float32)
    orig = pgd.generate_raw_derivs_pallas
    with mock.patch.object(pgd, "generate_raw_derivs_pallas",
                           lambda *a, **k: orig(*a, interpret=True, **k)):
        got = gridgen.generate_grid(counts, spacing, origin, "lja", pos,
                                    q, sig, eps, compute_derivatives=True,
                                    backend="pallas", dtype=jnp.float32)
    d1 = np.asarray(ref.derivs)
    d2 = np.asarray(got.derivs)
    scale = np.abs(d1).max(axis=(0, 1, 2)) + 1e-30
    assert (np.abs(d2 - d1) / scale).max() < 5e-5


def test_tiled_generation_pallas_backend(tmp_path):
    """generate_grid_to_tiled_file(backend='pallas') == jnp backend."""
    from unittest import mock

    import openmmgridforce_tpu.ops.pallas_gridgen as pg
    from openmmgridforce_tpu.io import TiledGridReader

    counts = (10, 9, 8)
    spacing = (0.1,) * 3
    origin = (0.0,) * 3
    A = 9
    pos = RNG.uniform(-0.2, 1.0, (A, 3))
    q = RNG.uniform(-0.5, 0.5, A)
    sig = RNG.uniform(0.25, 0.35, A)
    eps = RNG.uniform(0.2, 0.8, A)

    p_ref = str(tmp_path / "jnp.tiled")
    gridgen.generate_grid_to_tiled_file(
        p_ref, counts, spacing, origin, "charge", pos, q, sig, eps,
        tile_size=4)

    p_got = str(tmp_path / "pallas.tiled")
    orig = pg.generate_grid_values_pallas
    with mock.patch.object(
            pg, "generate_grid_values_pallas",
            lambda *a, **k: orig(*a, interpret=True, **k)):
        gridgen.generate_grid_to_tiled_file(
            p_got, counts, spacing, origin, "charge", pos, q, sig, eps,
            tile_size=4, backend="pallas")

    with TiledGridReader(p_ref) as r1, TiledGridReader(p_got) as r2:
        v1, _ = r1.read_full()
        v2, _ = r2.read_full()
    np.testing.assert_allclose(v2, v1, rtol=1e-5, atol=1e-5)


def test_tiled_generation_pallas_derivs(tmp_path):
    """generate_grid_to_tiled_file(backend='pallas',
    compute_derivatives=True) matches the jnp tile_derivs path (the
    canonical/stress Hermite-grid build — VERDICT r3 next #5)."""
    from unittest import mock

    import openmmgridforce_tpu.ops.pallas_gridgen_derivs as pgd
    from openmmgridforce_tpu.io import TiledGridReader

    counts = (9, 8, 7)
    spacing = (0.1,) * 3
    origin = (0.0,) * 3
    A = 9
    pos = RNG.uniform(-0.2, 0.9, (A, 3))
    q = RNG.uniform(-0.5, 0.5, A)
    sig = RNG.uniform(0.25, 0.35, A)
    eps = RNG.uniform(0.2, 0.8, A)

    p_ref = str(tmp_path / "jnp.tiled")
    gridgen.generate_grid_to_tiled_file(
        p_ref, counts, spacing, origin, "lja", pos, q, sig, eps,
        tile_size=4, compute_derivatives=True)

    p_got = str(tmp_path / "pallas.tiled")
    orig = pgd.generate_raw_derivs_pallas
    with mock.patch.object(
            pgd, "generate_raw_derivs_pallas",
            lambda *a, **k: orig(*a, interpret=True, **k)):
        gridgen.generate_grid_to_tiled_file(
            p_got, counts, spacing, origin, "lja", pos, q, sig, eps,
            tile_size=4, compute_derivatives=True, backend="pallas")

    with TiledGridReader(p_ref) as r1, TiledGridReader(p_got) as r2:
        v1, d1 = r1.read_full()
        v2, d2 = r2.read_full()
    scale = np.abs(d1).max(axis=(1, 2, 3), keepdims=True) + 1e-30
    assert (np.abs(d2 - d1) / scale).max() < 5e-5
    np.testing.assert_allclose(
        v2, v1, atol=5e-5 * float(np.abs(v1).max()))


def test_backend_auto_resolution():
    """auto -> jnp on CPU (pallas only opts in on TPU-like platforms);
    explicit values pass through; non-f32 dtypes force jnp."""
    from openmmgridforce_tpu.ops.gridgen import _resolve_backend
    assert _resolve_backend("auto", jnp.float32) == "jnp"  # CPU tests
    assert _resolve_backend("auto", jnp.float64) == "jnp"
    assert _resolve_backend("pallas", jnp.float32) == "pallas"
    assert _resolve_backend("jnp", jnp.float32) == "jnp"
