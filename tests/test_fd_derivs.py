"""Finite-difference 27-derivative computation vs exact polynomial fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.ops import evaluate_grid
from openmmgridforce_tpu.ops.derivatives27 import DERIV_ORDERS
from openmmgridforce_tpu.ops.fd_derivs import fd_derivatives27

RNG = np.random.default_rng(71)


def _poly_field_and_derivs(coeffs, xs, ys, zs, spacing):
    """Evaluate a per-axis-degree<=2 polynomial and all its derivatives
    exactly on a grid (cell-fractional scaling)."""
    def eval_d(a, b, c):
        cx = np.polynomial.polynomial.polyder if False else None
        out = np.zeros((len(xs), len(ys), len(zs)))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    cf = coeffs[i, j, k]
                    # derivative of x^i of order a
                    def dpow(p, o, v):
                        c = 1.0
                        for _ in range(o):
                            c *= p
                            p -= 1
                        if p < 0:
                            return np.zeros_like(v)
                        return c * v ** p
                    out += cf * (dpow(i, a, xs)[:, None, None]
                                 * dpow(j, b, ys)[None, :, None]
                                 * dpow(k, c, zs)[None, None, :])
        return out

    f = eval_d(0, 0, 0)
    derivs = np.stack([
        eval_d(a, b, c) * spacing[0] ** a * spacing[1] ** b * spacing[2] ** c
        for (a, b, c) in DERIV_ORDERS], axis=-1)
    return f, derivs


def test_fd_matches_exact_on_quadratic_field():
    """Degree-2-per-axis polynomials are differentiated EXACTLY by the
    centered stencils in the interior; at boundaries, first and pure-second
    derivatives (which use one-sided stencils) stay exact, while mixed
    terms use clamped-centered stencils and are approximate there — the
    reference's behavior (ReferenceGridForceKernels.cpp:354-450)."""
    counts = (7, 6, 8)
    spacing = (0.2, 0.25, 0.15)
    coeffs = RNG.standard_normal((3, 3, 3))
    xs = np.arange(counts[0]) * spacing[0]
    ys = np.arange(counts[1]) * spacing[1]
    zs = np.arange(counts[2]) * spacing[2]
    f, want = _poly_field_and_derivs(coeffs, xs, ys, zs, spacing)

    got = np.asarray(fd_derivatives27(jnp.asarray(f), spacing))
    # interior: everything exact
    np.testing.assert_allclose(got[1:-1, 1:-1, 1:-1],
                               want[1:-1, 1:-1, 1:-1], rtol=1e-8,
                               atol=1e-9)
    # boundaries: f and pure-second derivatives exact everywhere (their
    # one-sided stencils are 2nd order); one-sided FIRST derivatives are
    # 1st-order (reference :304-326) so only f/fxx/fyy/fzz stay exact
    for d in [0, 4, 7, 9]:
        np.testing.assert_allclose(got[..., d], want[..., d], rtol=1e-8,
                                   atol=1e-9)


def test_fd_convergence_on_smooth_field():
    """Interior accuracy is 2nd order: quartering the error when halving h."""
    def field(x, y, z):
        return np.sin(1.3 * x) * np.cos(0.7 * y) * np.exp(0.3 * z)

    errs = []
    for n in (17, 33):
        h = 1.0 / (n - 1)
        xs = np.linspace(0, 1, n)
        f = field(xs[:, None, None], xs[None, :, None], xs[None, None, :])
        D = np.asarray(fd_derivatives27(jnp.asarray(f), (h, h, h)))
        # check d/dx (slot 1) in the interior, physical units
        got = D[2:-2, 2:-2, 2:-2, 1] / h
        want = (1.3 * np.cos(1.3 * xs)[:, None, None]
                * np.cos(0.7 * xs)[None, :, None]
                * np.exp(0.3 * xs)[None, None, :])[2:-2, 2:-2, 2:-2]
        errs.append(np.abs(got - want).max())
    assert errs[1] < errs[0] / 3.0


def test_fd_overlap_region_clamping():
    counts = (5, 5, 5)
    cap = 100.0
    vals = np.full(counts, cap)  # fully capped region
    vals[0, 0, 0] = 1.0
    D = np.asarray(fd_derivatives27(jnp.asarray(vals), (0.1, 0.1, 0.1),
                                    grid_cap=cap))
    # at a capped point: value kept, higher derivatives zeroed
    assert D[2, 2, 2, 0] == cap
    np.testing.assert_array_equal(D[2, 2, 2, 4:], 0.0)
    assert np.all(np.abs(D[2, 2, 2, 1:4]) <= cap)


def test_fd_derivs_feed_hermite_evaluation():
    """Value grid -> FD derivatives -> triquintic evaluation reproduces a
    smooth polynomial field (the reference-platform flow for value-only
    grids, ReferenceGridForceKernels.cpp:212-278)."""
    counts = (8, 8, 8)
    spacing = (0.2, 0.2, 0.2)
    coeffs = RNG.standard_normal((3, 3, 3))
    xs = np.arange(counts[0]) * spacing[0]
    f, _ = _poly_field_and_derivs(coeffs, xs, xs, xs, spacing)

    D = np.asarray(fd_derivatives27(jnp.asarray(f), spacing))
    grid = Grid.create(f, spacing, (0.0, 0.0, 0.0), derivs=D,
                       interp_method=InterpolationMethod.TRIQUINTIC,
                       dtype=np.float64)
    pos = RNG.uniform(0.25, 1.15, (20, 3))
    res = evaluate_grid(grid, pos, np.ones(20))

    want = np.zeros(20)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                want += (coeffs[i, j, k] * pos[:, 0] ** i * pos[:, 1] ** j
                         * pos[:, 2] ** k)
    np.testing.assert_allclose(np.asarray(res.per_atom_energy), want,
                               rtol=1e-8, atol=1e-9)
