"""Interpolation-kernel correctness.

Oracles are independent of the implementation:
  * trilinear vs scipy RegularGridInterpolator;
  * analytic forces vs jax.grad of the energy;
  * Hermite (tricubic/triquintic) vs an independently-constructed
    polynomial-constraint solve (the mathematical definition that the
    reference's 64x64 / 216x216 matrices encode);
  * polynomial-reproduction: a Hermite interpolant of an exactly-representable
    polynomial field must reproduce it everywhere in the cell;
  * out-of-bounds restraint closed form.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from openmmgridforce_tpu import Grid, InterpolationMethod, InvPowerMode
from openmmgridforce_tpu.ops import evaluate_grid, grid_energy
from openmmgridforce_tpu.ops.derivatives27 import (DERIV_ORDERS,
                                                   TRICUBIC_DERIV_MAP)

RNG = np.random.default_rng(123)
COUNTS = (6, 7, 8)
SPACING = (0.11, 0.09, 0.13)
ORIGIN = (0.5, -0.2, 0.3)


def make_grid(method=InterpolationMethod.TRILINEAR, derivs=None, **kw):
    vals = RNG.standard_normal(COUNTS)
    return Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, dtype=np.float64, **kw)


def interior_positions(n=40):
    lo = np.asarray(ORIGIN) + 1.5 * np.asarray(SPACING)
    hi = (np.asarray(ORIGIN)
          + (np.asarray(COUNTS) - 2.5) * np.asarray(SPACING))
    return RNG.uniform(lo, hi, size=(n, 3))


def test_trilinear_matches_scipy():
    grid = make_grid()
    pos = interior_positions()
    scaling = RNG.standard_normal(len(pos))

    axes = [np.asarray(ORIGIN)[d] + np.arange(COUNTS[d]) * SPACING[d]
            for d in range(3)]
    rgi = RegularGridInterpolator(axes, np.asarray(grid.vals))
    want = scaling * rgi(pos)

    res = evaluate_grid(grid, pos, scaling)
    np.testing.assert_allclose(np.asarray(res.per_atom_energy), want,
                               rtol=1e-12)
    assert res.energy == pytest.approx(want.sum(), rel=1e-12)


@pytest.mark.parametrize("method", [InterpolationMethod.TRILINEAR,
                                    InterpolationMethod.BSPLINE])
def test_forces_match_autodiff(method):
    grid = make_grid(method)
    pos = interior_positions(10)
    scaling = RNG.standard_normal(len(pos))

    res = evaluate_grid(grid, pos, scaling)
    g = jax.grad(lambda p: grid_energy(grid, p, scaling))(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(res.forces), -np.asarray(g),
                               rtol=1e-9, atol=1e-12)


def test_out_of_bounds_restraint():
    grid = make_grid(oob_k=500.0)
    corner = np.asarray(ORIGIN) + (np.asarray(COUNTS) - 1) * np.asarray(
        SPACING)
    pos = np.array([
        np.asarray(ORIGIN) - [0.3, 0.0, 0.1],   # below in x and z
        corner + [0.0, 0.2, 0.0],               # above in y
    ])
    scaling = np.ones(2)
    res = evaluate_grid(grid, pos, scaling)

    want0 = 0.5 * 500.0 * (0.3 ** 2 + 0.1 ** 2)
    want1 = 0.5 * 500.0 * 0.2 ** 2
    np.testing.assert_allclose(np.asarray(res.per_atom_energy),
                               [want0, want1], rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.forces)[0],
                               [-500.0 * -0.3, 0.0, -500.0 * -0.1],
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.forces)[1],
                               [0.0, -500.0 * 0.2, 0.0], rtol=1e-12,
                               atol=1e-9)


def test_zero_scaling_is_inert():
    grid = make_grid()
    pos = interior_positions(5)
    res = evaluate_grid(grid, pos, np.zeros(5))
    assert float(res.energy) == 0.0
    np.testing.assert_array_equal(np.asarray(res.forces), 0.0)


# ----------------------------------------------------------------------
# Hermite interpolation vs the constraint-matrix definition
# ----------------------------------------------------------------------

def _monomial_deriv_at(i, j, k, orders, s):
    """d^orders (x^i y^j z^k) evaluated at corner s (in {0,1}^3)."""
    def d1(p, o, v):
        c = 1.0
        for _ in range(o):
            c *= p
            p -= 1
        if p < 0:
            return 0.0
        return c * v ** p if p > 0 else c
    return (d1(i, orders[0], s[0]) * d1(j, orders[1], s[1])
            * d1(k, orders[2], s[2]))


def _constraint_solve(deg, deriv_orders, X):
    """Solve for the unique tensor-product polynomial of per-axis degree
    < deg matching derivative data X[d, corner] at the 8 cell corners.
    Returns coefficient array c[i, j, k]."""
    corners = list(itertools.product([0, 1], repeat=3))
    corners = [(cx, cy, cz) for (cz, cy, cx) in corners]  # z-major order? no:
    corners = []
    for cz in [0, 1]:
        for cy in [0, 1]:
            for cx in [0, 1]:
                corners.append((cx, cy, cz))
    # corner order must match the evaluation's c = cx + 2*cy + 4*cz
    n = deg ** 3
    B = np.zeros((len(deriv_orders) * 8, n))
    rhs = np.zeros(len(deriv_orders) * 8)
    monomials = list(itertools.product(range(deg), repeat=3))
    for di, orders in enumerate(deriv_orders):
        for ci, s in enumerate(corners):
            row = di * 8 + ci
            rhs[row] = X[di, ci]
            for col, (i, j, k) in enumerate(monomials):
                B[row, col] = _monomial_deriv_at(i, j, k, orders, s)
    coef = np.linalg.solve(B, rhs)
    c = np.zeros((deg,) * 3)
    for col, (i, j, k) in enumerate(monomials):
        c[i, j, k] = coef[col]
    return c


def _poly_eval(c, s):
    deg = c.shape[0]
    powers = [np.asarray([sv ** p for p in range(deg)]) for sv in s]
    return np.einsum("ijk,i,j,k->", c, powers[0], powers[1], powers[2])


def _poly_grad(c, s):
    deg = c.shape[0]
    out = []
    for ax in range(3):
        dc = np.zeros_like(c)
        sl = [slice(None)] * 3
        for p in range(1, deg):
            sl_src = list(sl)
            sl_dst = list(sl)
            sl_src[ax] = p
            sl_dst[ax] = p - 1
            dc[tuple(sl_dst)] += p * c[tuple(sl_src)]
        out.append(_poly_eval(dc, s))
    return np.asarray(out)


@pytest.mark.parametrize("method,deg,dmap", [
    (InterpolationMethod.TRICUBIC, 4, list(TRICUBIC_DERIV_MAP)),
    (InterpolationMethod.TRIQUINTIC, 6, list(range(27))),
])
def test_hermite_matches_constraint_solve(method, deg, dmap):
    """The tensor-product Hermite evaluation must equal the unique
    polynomial solving the corner-derivative constraints — the definition
    behind the reference's coefficient matrices."""
    nx, ny, nz = 3, 3, 3
    derivs = RNG.standard_normal((nx, ny, nz, 27))
    vals = derivs[..., 0].copy()
    grid = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, dtype=np.float64)

    # probe points inside cell (1,1,1)
    fracs = RNG.uniform(0.05, 0.95, size=(6, 3))
    pos = (np.asarray(ORIGIN)
           + (1.0 + fracs) * np.asarray(SPACING))
    scaling = np.ones(len(pos))
    res = evaluate_grid(grid, pos, scaling)

    # oracle: constraint solve on cell (1,1,1)
    deriv_orders = [DERIV_ORDERS[d] for d in dmap]
    X = np.zeros((len(dmap), 8))
    ci = 0
    for cz in [0, 1]:
        for cy in [0, 1]:
            for cx in [0, 1]:
                pass
    corners = [(cx, cy, cz) for cz in [0, 1] for cy in [0, 1]
               for cx in [0, 1]]
    # order must be c = cx + 2*cy + 4*cz
    corners = sorted(corners, key=lambda s: s[0] + 2 * s[1] + 4 * s[2])
    for di, d in enumerate(dmap):
        for ci, (cx, cy, cz) in enumerate(corners):
            X[di, ci] = derivs[1 + cx, 1 + cy, 1 + cz, d]
    c = _constraint_solve(deg, deriv_orders, X)

    for a, f in enumerate(fracs):
        want_e = _poly_eval(c, f)
        want_g = _poly_grad(c, f) / np.asarray(SPACING)
        assert float(res.per_atom_energy[a]) == pytest.approx(
            want_e, rel=1e-9, abs=1e-10)
        np.testing.assert_allclose(np.asarray(res.forces[a]), -want_g,
                                   rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("method,maxord", [
    (InterpolationMethod.TRICUBIC, 1),
    (InterpolationMethod.TRIQUINTIC, 2),
])
def test_hermite_reproduces_polynomial_field(method, maxord):
    """Interpolating a field that is exactly a tensor-product polynomial of
    per-axis degree <= (2*maxord+1) must reproduce it exactly."""
    deg = 2 * maxord + 2  # polynomial degrees 0..deg-1 per axis
    coeffs = RNG.standard_normal((deg, deg, deg))

    sp = np.asarray(SPACING)
    org = np.asarray(ORIGIN)

    def field(p):  # physical coords
        s = (p - org) / sp  # global fractional coords
        return _poly_eval(coeffs, s)

    # exact derivatives of the field at all grid points, in cell-fractional
    # units (d/ds of the *global* fraction equals d/ds of cell fraction)
    nx, ny, nz = 4, 4, 4
    derivs = np.zeros((nx, ny, nz, 27))
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                s0 = np.asarray([ix, iy, iz], dtype=float)
                for d, orders in enumerate(DERIV_ORDERS):
                    c = coeffs
                    for ax, o in enumerate(orders):
                        for _ in range(o):
                            dc = np.zeros_like(c)
                            sl = [slice(None)] * 3
                            for p in range(1, c.shape[ax]):
                                src = list(sl)
                                dst = list(sl)
                                src[ax] = p
                                dst[ax] = p - 1
                                dc[tuple(dst)] += p * c[tuple(src)]
                            c = dc
                    derivs[ix, iy, iz, d] = _poly_eval(c, s0)

    grid = Grid.create(derivs[..., 0], SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, dtype=np.float64)
    pos = (org + RNG.uniform(0.2, nx - 1.2, size=(15, 3)) * sp)
    res = evaluate_grid(grid, pos, np.ones(len(pos)))
    want = np.asarray([field(p) for p in pos])
    np.testing.assert_allclose(np.asarray(res.per_atom_energy), want,
                               rtol=1e-9, atol=1e-9)


def test_hermite_forces_match_autodiff():
    grid = make_grid(InterpolationMethod.TRIQUINTIC,
                     derivs=RNG.standard_normal(COUNTS + (27,)))
    pos = interior_positions(8)
    scaling = RNG.standard_normal(len(pos))
    res = evaluate_grid(grid, pos, scaling)
    g = jax.grad(lambda p: grid_energy(grid, p, scaling))(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(res.forces), -np.asarray(g),
                               rtol=1e-9, atol=1e-11)


# ----------------------------------------------------------------------
# Inverse-power modes
# ----------------------------------------------------------------------

def test_stored_invpower_roundtrip_trilinear():
    """A STORED-mode grid holding G^(1/n) must evaluate to ~G at grid
    points (back-transform exactness at nodes)."""
    n = 2.0
    raw = np.abs(RNG.standard_normal(COUNTS)) + 0.5
    stored = raw ** (1.0 / n)
    grid = Grid.create(stored, SPACING, ORIGIN,
                       inv_power_mode=InvPowerMode.STORED, inv_power=n,
                       dtype=np.float64)
    # probe exactly at grid nodes
    nodes = np.array([[1, 2, 3], [4, 5, 6], [2, 2, 2]])
    pos = np.asarray(ORIGIN) + nodes * np.asarray(SPACING)
    res = evaluate_grid(grid, pos, np.ones(len(pos)))
    want = raw[tuple(nodes.T)]
    np.testing.assert_allclose(np.asarray(res.per_atom_energy), want,
                               rtol=1e-10)


def test_runtime_equals_stored_at_nodes():
    """RUNTIME (transform in kernel) and STORED (pre-transformed grid) must
    agree: RUNTIME on raw grid == STORED on transformed grid."""
    n = 2.0
    raw = np.abs(RNG.standard_normal(COUNTS)) + 0.5
    g_runtime = Grid.create(raw, SPACING, ORIGIN,
                            inv_power_mode=InvPowerMode.RUNTIME, inv_power=n,
                            dtype=np.float64)
    g_stored = Grid.create(raw ** (1.0 / n), SPACING, ORIGIN,
                           inv_power_mode=InvPowerMode.STORED, inv_power=n,
                           dtype=np.float64)
    pos = interior_positions(12)
    s = np.ones(len(pos))
    r1 = evaluate_grid(g_runtime, pos, s)
    r2 = evaluate_grid(g_stored, pos, s)
    np.testing.assert_allclose(np.asarray(r1.per_atom_energy),
                               np.asarray(r2.per_atom_energy), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r1.forces),
                               np.asarray(r2.forces), rtol=1e-9, atol=1e-12)


def test_runtime_invpower_forces_match_autodiff():
    n = 2.0
    raw = np.abs(RNG.standard_normal(COUNTS)) + 0.5
    grid = Grid.create(raw, SPACING, ORIGIN,
                       inv_power_mode=InvPowerMode.RUNTIME, inv_power=n,
                       interp_method=InterpolationMethod.BSPLINE,
                       dtype=np.float64)
    pos = interior_positions(6)
    scaling = RNG.standard_normal(len(pos))
    res = evaluate_grid(grid, pos, scaling)
    g = jax.grad(lambda p: grid_energy(grid, p, scaling))(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(res.forces), -np.asarray(g),
                               rtol=1e-8, atol=1e-10)


def test_batched_replicas_vmap():
    """vmap over replica positions — the TPU replacement for particle-group
    batching (reference CudaGridForceKernels.cpp:607-675)."""
    grid = make_grid()
    R, L = 4, 7
    pos = np.stack([interior_positions(L) for _ in range(R)])
    scaling = RNG.standard_normal(L)
    batched = jax.vmap(lambda p: evaluate_grid(grid, p, scaling))(
        jnp.asarray(pos))
    for r in range(R):
        single = evaluate_grid(grid, pos[r], scaling)
        np.testing.assert_allclose(np.asarray(batched.energy)[r],
                                   float(single.energy), rtol=1e-12)
