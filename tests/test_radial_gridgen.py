"""Radial tables, tensor conversion and grid generation vs autodiff oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.grid import InvPowerMode
from openmmgridforce_tpu.ops import gridgen, radial
from openmmgridforce_tpu.ops.chain_rules import tanh_cap_value
from openmmgridforce_tpu.units import COULOMB_CONST, TWO_POW_ONE_SIXTH
from tests.helpers import derivs27_by_autodiff

RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("grid_type", ["charge", "ljr", "lja"])
def test_radial_derivatives_match_autodiff(grid_type):
    q, sigma, eps = 0.7, 0.31, 1.2
    r0 = 0.83

    def U_of_r(r):
        return radial.field_value(r, grid_type, q, sigma, eps)

    rad = np.asarray(radial.radial_derivatives(
        jnp.asarray(r0 * r0), grid_type, q, sigma, eps))

    f = U_of_r
    for n in range(7):
        want = float(f(jnp.asarray(r0)))
        assert rad[n] == pytest.approx(want, rel=1e-10), f"order {n}"
        f = jax.grad(f)


@pytest.mark.parametrize("grid_type", ["charge", "lja"])
def test_cartesian_tensor_conversion_matches_autodiff(grid_type):
    """radial_to_cartesian must reproduce nested autodiff of U(|p - a|)."""
    q, sigma, eps = -0.4, 0.28, 0.9
    atom = jnp.asarray([0.1, -0.2, 0.05])
    point = jnp.asarray([0.6, 0.35, -0.4])

    def field(p):
        r = jnp.sqrt(jnp.sum((p - atom) ** 2))
        return radial.field_value(r, grid_type, q, sigma, eps)

    dr = point - atom
    r2 = jnp.sum(dr * dr)
    rad = radial.radial_derivatives(r2, grid_type, q, sigma, eps)
    got = np.asarray(radial.radial_to_cartesian(dr, rad))

    want = derivs27_by_autodiff(field, point)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_generate_values_match_direct_sum():
    """Value-only generation vs a plain numpy double loop (the reference's
    oracle pattern, test_simple_grid_energy.py:124-184)."""
    counts = (4, 5, 3)
    spacing = (0.1, 0.12, 0.09)
    origin = (0.0, -0.1, 0.2)
    n_atoms = 6
    pos = RNG.uniform(-0.2, 0.6, (n_atoms, 3))
    q = RNG.uniform(-1, 1, n_atoms)
    sig = RNG.uniform(0.2, 0.35, n_atoms)
    eps = RNG.uniform(0.1, 1.0, n_atoms)
    cap = 500.0

    for gt in ["charge", "ljr", "lja"]:
        grid = gridgen.generate_grid(counts, spacing, origin, gt, pos, q,
                                     sig, eps, grid_cap=cap, chunk_size=16,
                                     dtype=jnp.float64)
        vals = np.asarray(grid.vals)
        for _ in range(10):
            i, j, k = (RNG.integers(0, counts[0]), RNG.integers(0, counts[1]),
                       RNG.integers(0, counts[2]))
            gp = np.asarray(origin) + np.array([i, j, k]) * np.asarray(
                spacing)
            total = 0.0
            for a in range(n_atoms):
                r = max(np.linalg.norm(gp - pos[a]), 1e-6)
                if gt == "charge":
                    total += COULOMB_CONST * q[a] / r
                elif gt == "ljr":
                    rmin = TWO_POW_ONE_SIXTH * sig[a]
                    total += np.sqrt(eps[a]) * rmin ** 6 / r ** 12
                else:
                    rmin = TWO_POW_ONE_SIXTH * sig[a]
                    total += -2.0 * np.sqrt(eps[a]) * rmin ** 3 / r ** 6
            want = cap * np.tanh(total / cap)
            assert vals[i, j, k] == pytest.approx(want, rel=1e-10), (gt, i,
                                                                     j, k)


def test_generate_derivatives_match_autodiff_field():
    """Full derivative pipeline (radial + tensor + tanh chain + fractional
    scaling) vs nested autodiff of the composed capped field."""
    counts = (3, 3, 3)
    spacing = (0.11, 0.1, 0.12)
    origin = (0.3, 0.3, 0.3)
    pos = np.array([[0.0, 0.1, 0.2], [0.8, 0.7, 0.9]])
    q = np.array([0.9, 1.4])
    sig = np.array([0.3, 0.25])
    eps = np.array([0.6, 0.8])
    cap = 50.0  # low cap so some points are in the tanh regime

    grid = gridgen.generate_grid(counts, spacing, origin, "ljr", pos, q,
                                 sig, eps, compute_derivatives=True,
                                 grid_cap=cap, chunk_size=8,
                                 dtype=jnp.float64)
    derivs = np.asarray(grid.derivs)

    def capped_field(p):
        r2 = jnp.sum((p[None, :] - pos) ** 2, axis=-1)
        r2 = jnp.maximum(r2, 4e-4)
        rmin = TWO_POW_ONE_SIXTH * jnp.asarray(sig)
        U = jnp.sum(jnp.sqrt(jnp.asarray(eps)) * rmin ** 6 / r2 ** 6)
        return cap * jnp.tanh(U / cap)

    from openmmgridforce_tpu.ops.derivatives27 import DERIV_ORDERS
    scale = np.array([
        spacing[0] ** a * spacing[1] ** b * spacing[2] ** c
        for (a, b, c) in DERIV_ORDERS])

    for (i, j, k) in [(0, 0, 0), (1, 1, 1), (2, 0, 2)]:
        gp = np.asarray(origin) + np.array([i, j, k]) * np.asarray(spacing)
        want_phys = derivs27_by_autodiff(capped_field, gp)
        got = derivs[i, j, k]
        u = want_phys[0] / cap
        if u < 0.1:
            # passthrough branch: raw (uncapped) derivatives stored
            def raw_field(p):
                r2 = jnp.sum((p[None, :] - pos) ** 2, axis=-1)
                r2 = jnp.maximum(r2, 4e-4)
                rmin = TWO_POW_ONE_SIXTH * jnp.asarray(sig)
                return jnp.sum(jnp.sqrt(jnp.asarray(eps))
                               * rmin ** 6 / r2 ** 6)
            want_phys = derivs27_by_autodiff(raw_field, gp)
        want = want_phys * scale
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_generate_stored_invpower_values():
    counts = (3, 3, 3)
    spacing = (0.1, 0.1, 0.1)
    origin = (0.25, 0.25, 0.25)
    pos = np.array([[0.0, 0.0, 0.0]])
    q = np.array([1.0])
    sig = np.array([0.3])
    eps = np.array([0.5])
    n = 2.0

    g_raw = gridgen.generate_grid(counts, spacing, origin, "ljr", pos, q,
                                  sig, eps, dtype=jnp.float64)
    g_tr = gridgen.generate_grid(counts, spacing, origin, "ljr", pos, q,
                                 sig, eps, inv_power=n,
                                 inv_power_mode=InvPowerMode.STORED,
                                 dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(g_tr.vals),
                               np.asarray(g_raw.vals) ** (1.0 / n),
                               rtol=1e-12)


def test_auto_scaling_factors_conventions():
    q = np.array([0.5, -0.3])
    sig = np.array([0.3, 0.2])
    eps = np.array([0.4, 0.9])
    np.testing.assert_allclose(
        np.asarray(gridgen.auto_scaling_factors("charge", q, sig, eps)), q)
    rmin = TWO_POW_ONE_SIXTH * sig
    np.testing.assert_allclose(
        np.asarray(gridgen.auto_scaling_factors("ljr", q, sig, eps)),
        np.sqrt(eps) * rmin ** 6, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(gridgen.auto_scaling_factors("lja", q, sig, eps,
                                                convention="diameter")),
        np.sqrt(eps) * (2 * sig) ** 3, rtol=1e-12)


def test_memory_guard_raises_for_oversized_grids(monkeypatch):
    """The proactive OOM check (reference skips derivatives above 80% free
    GPU memory, CudaGridForceKernels.cpp:527-535) must turn a certain
    device OOM into an actionable error naming the tiled path."""
    from openmmgridforce_tpu.ops import gridgen

    monkeypatch.setattr(gridgen, "_device_memory_budget",
                        lambda: 1 << 30)  # pretend 1 GB free
    with pytest.raises(ValueError, match="tiled"):
        gridgen.generate_grid(
            (512, 512, 512), (0.01,) * 3, (0.0,) * 3, "charge",
            np.zeros((4, 3)), np.ones(4), np.full(4, 0.3), np.ones(4),
            compute_derivatives=True)
    # values-only: 640^3 * 4B * 2 = 2.1 GB > 1 GB -> also raises
    with pytest.raises(ValueError, match="tiled"):
        gridgen.generate_grid(
            (640, 640, 640), (0.01,) * 3, (0.0,) * 3, "charge",
            np.zeros((4, 3)), np.ones(4), np.full(4, 0.3), np.ones(4))
    # small grid passes the guard and generates
    g = gridgen.generate_grid(
        (9, 9, 9), (0.05,) * 3, (0.0,) * 3, "charge",
        np.full((2, 3), 2.0), np.ones(2), np.full(2, 0.3), np.ones(2))
    assert np.all(np.isfinite(np.asarray(g.vals)))
