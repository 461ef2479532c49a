"""Compensated (double-float32) evaluation tier: two-float primitives and
parity of ops/compensated.py with the float64 reference evaluation.

The gate this tier exists for: ≤1e-5 relative error vs the f64 reference
semantics on steep capped fields where plain f32 evaluation floors at
~1e-5-1e-4 (BENCH_CANONICAL accuracy rows)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openmmgridforce_tpu import Grid, InterpolationMethod, InvPowerMode
from openmmgridforce_tpu.ops import evaluate_grid
from openmmgridforce_tpu.ops.compensated import (evaluate_compensated,
                                                 pack_grid_compensated)
from openmmgridforce_tpu.ops import twofloat as tf

RNG = np.random.default_rng(77)
COUNTS = (6, 7, 8)
SPACING = (0.11, 0.09, 0.13)
ORIGIN = (0.5, -0.2, 0.3)


# ----------------------------------------------------------------------
# two-float primitives
# ----------------------------------------------------------------------

class TestTwoFloat:
    def test_two_sum_exact(self):
        a = jnp.asarray(RNG.standard_normal(1000) * 1e6, jnp.float32)
        b = jnp.asarray(RNG.standard_normal(1000) * 1e-3, jnp.float32)
        s, e = jax.jit(tf.two_sum)(a, b)
        exact = (np.asarray(a, np.float64) + np.asarray(b, np.float64))
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_two_prod_near_exact(self):
        a = jnp.asarray(RNG.standard_normal(1000) * 1e4, jnp.float32)
        b = jnp.asarray(RNG.standard_normal(1000) * 1e-2, jnp.float32)
        p, e = jax.jit(tf.two_prod)(a, b)
        exact = (np.asarray(a, np.float64) * np.asarray(b, np.float64))
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        # the FMA-contraction-proof form is exact up to ~2u^2 (2^-47)
        np.testing.assert_allclose(got, exact, rtol=1e-13)
        # and the high word is within 1 ulp of the rounded product
        np.testing.assert_allclose(np.asarray(p, np.float64), exact,
                                   rtol=1.3e-7)

    def test_two_prod_const_operand_jit(self):
        """The case that broke the textbook form: a trace-time-constant
        operand lets LLVM contract `p - c` / `p + c` into an FMA of the
        unrounded product. The add-only assembly must hold ~u^2 under
        jit exactly as it does eagerly."""
        x64 = RNG.standard_normal(1000) * 1e5
        x = tuple(map(jnp.asarray, tf.df_from_f64(x64)))
        c64 = 1.0 / 50.0

        def f(x_hi, x_lo):
            c = tf.df(jnp.full_like(x_hi, np.float32(c64)),
                      jnp.full_like(x_hi, np.float32(
                          c64 - np.float64(np.float32(c64)))))
            return tf.df_mul((x_hi, x_lo), c)

        for runner in (f, jax.jit(f)):
            hi, lo = runner(*x)
            got = (np.asarray(hi, np.float64)
                   + np.asarray(lo, np.float64))
            np.testing.assert_allclose(got, x64 * c64, rtol=1e-13)

    def test_df_mul_add_accuracy(self):
        x64 = RNG.standard_normal(500) * 1e5
        y64 = RNG.standard_normal(500)
        x = tuple(map(jnp.asarray, tf.df_from_f64(x64)))
        y = tuple(map(jnp.asarray, tf.df_from_f64(y64)))
        prod = jax.jit(tf.df_mul)(x, y)
        got = (np.asarray(prod[0], np.float64)
               + np.asarray(prod[1], np.float64))
        np.testing.assert_allclose(got, x64 * y64, rtol=1e-13)
        tot = jax.jit(tf.df_add)(x, y)
        got = (np.asarray(tot[0], np.float64)
               + np.asarray(tot[1], np.float64))
        np.testing.assert_allclose(got, x64 + y64, rtol=1e-13)


# ----------------------------------------------------------------------
# compensated evaluation parity with the f64 reference semantics
# ----------------------------------------------------------------------

def positions_everywhere(n=60):
    lo = np.asarray(ORIGIN)
    hi = lo + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    pts = [RNG.uniform(lo - 0.1, hi + 0.1, size=(n, 3))]
    pts.append(lo + np.array([[0, 0, 0], [1, 2, 3], [4, 5, 6]])
               * np.asarray(SPACING))
    pts.append(np.array([hi, lo, [hi[0], lo[1], hi[2]]]))
    return np.concatenate(pts)


@pytest.mark.parametrize("method,needs_derivs,mode,n", [
    (InterpolationMethod.TRILINEAR, False, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.STORED, 3.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.RUNTIME, 2.0),
    (InterpolationMethod.TRICUBIC, True, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.TRIQUINTIC, True, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.TRIQUINTIC, True, InvPowerMode.STORED, 2.0),
])
def test_compensated_matches_f64_reference(method, needs_derivs, mode, n):
    vals = np.abs(RNG.standard_normal(COUNTS)) + 0.5
    derivs = RNG.standard_normal(COUNTS + (27,)) if needs_derivs else None
    if needs_derivs:
        derivs[..., 0] = vals
    grid = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, inv_power_mode=mode,
                       inv_power=n, oob_k=777.0, dtype=np.float64)
    cp = pack_grid_compensated(grid)
    assert cp.coeffs.dtype == jnp.float32

    pos = positions_everywhere()
    scaling = RNG.standard_normal(len(pos))
    scaling[3] = 0.0

    ref = evaluate_grid(grid, pos, scaling)
    got = evaluate_compensated(cp, pos, scaling)

    ref_pa = np.asarray(ref.per_atom_energy)
    scale = np.abs(ref_pa).max()
    # limited by the final per-atom f32 collapse (~6e-8 relative)
    np.testing.assert_allclose(np.asarray(got.per_atom_energy, np.float64),
                               ref_pa, rtol=2e-6, atol=2e-6 * scale)
    # forces: exclude atoms sitting EXACTLY on cell boundaries — the
    # interpolant gradient is discontinuous there, so which cell the
    # f64 division vs the df arithmetic lands the atom in is a
    # branch-ambiguous tie (values stay continuous and are compared
    # above for every atom)
    t = (pos - np.asarray(ORIGIN)) / np.asarray(SPACING)
    off_node = (np.abs(t - np.round(t)) > 1e-9).all(axis=1)
    fscale = np.abs(np.asarray(ref.forces)).max()
    np.testing.assert_allclose(np.asarray(got.forces, np.float64)[off_node],
                               np.asarray(ref.forces)[off_node],
                               rtol=2e-6, atol=2e-6 * fscale)
    # total energy: nodes contribute continuous values, keep them, but
    # the ref total is f64 while ours collapses per-atom to f32
    assert float(got.energy) == pytest.approx(float(ref.energy), rel=1e-6,
                                              abs=2e-6 * scale * len(pos))


def _steep_grid(method, counts=(12, 12, 12), spacing=0.05):
    """Receptor-core-like capped field: the f32 conditioning stressor."""
    rng = np.random.default_rng(7)
    rec = rng.uniform(0.15, 0.85 * (counts[0] - 1) * spacing, (12, 3))
    q = rng.uniform(0.05, 0.5, 12)
    from openmmgridforce_tpu.ops.gridgen import generate_grid
    return generate_grid(counts, (spacing,) * 3, (0.0,) * 3,
                         "lja", rec, q, np.full(12, 0.3),
                         np.full(12, 0.6),
                         compute_derivatives=method in (
                             InterpolationMethod.TRICUBIC,
                             InterpolationMethod.TRIQUINTIC),
                         interp_method=method, dtype=np.float64)


@pytest.mark.parametrize("method", [InterpolationMethod.BSPLINE,
                                    InterpolationMethod.TRICUBIC,
                                    InterpolationMethod.TRIQUINTIC])
def test_compensated_breaks_f32_floor(method):
    """On a steep capped field the compensated tier must sit at its
    per-atom-collapse design floor (~1e-7 of field scale) where the
    plain f32 tier carries its conditioning floor, and be at least 3x
    tighter than plain f32.

    Truth is the f64 stencil on the SAME f32-stored data (the
    bench_canonical accuracy-stage metric): that isolates evaluation
    conditioning — what the tier controls — from data storage. Measured
    on these fields (r4): plain 3.2e-7/1.5e-6/3.1e-6 vs compensated
    4.6e-8/6.9e-9/2.0e-8 for bspline/tricubic/triquintic."""
    from openmmgridforce_tpu.ops.packed import evaluate_packed, pack_grid

    g64 = _steep_grid(method)
    reps = dict(vals=jnp.asarray(g64.vals, jnp.float32),
                spacing=jnp.asarray(g64.spacing, jnp.float32),
                origin=jnp.asarray(g64.origin, jnp.float32))
    if g64.derivs is not None:
        reps["derivs"] = jnp.asarray(g64.derivs, jnp.float32)
    g32 = dataclasses.replace(g64, **reps)
    # f64 grid holding exactly the f32-stored data: evaluation truth
    reps64 = {k: jnp.asarray(np.asarray(v, np.float64))
              for k, v in reps.items()}
    g64c = dataclasses.replace(g64, **reps64)

    rng = np.random.default_rng(9)
    pos = rng.uniform(0.02, 0.5, (300, 3))
    scal = np.ones(300)

    truth = np.asarray(evaluate_grid(g64c, pos, scal).per_atom_energy)
    scale = np.abs(truth).max()

    plain = evaluate_packed(pack_grid(g32), pos.astype(np.float32),
                            scal.astype(np.float32))
    err_plain = np.abs(np.asarray(plain.per_atom_energy, np.float64)
                       - truth).max()

    comp = evaluate_compensated(pack_grid_compensated(g32), pos, scal)
    err_comp = np.abs(np.asarray(comp.per_atom_energy, np.float64)
                      - truth).max()

    assert err_comp / scale < 1.5e-7, (err_comp, scale)
    assert err_comp * 3 < err_plain, (err_comp, err_plain)


def test_compensated_f32_positions():
    """float32 positions (the MD state) still evaluate through the df
    path with zero low words and match f64 truth at those positions."""
    g64 = _steep_grid(InterpolationMethod.BSPLINE)
    cp = pack_grid_compensated(g64)
    rng = np.random.default_rng(10)
    pos32 = rng.uniform(0.05, 0.45, (100, 3)).astype(np.float32)
    scal = np.ones(100, np.float32)
    truth = np.asarray(evaluate_grid(
        g64, pos32.astype(np.float64), scal).per_atom_energy)
    got = np.asarray(evaluate_compensated(cp, pos32, scal)
                     .per_atom_energy, np.float64)
    scale = np.abs(truth).max()
    assert np.abs(got - truth).max() / scale < 1e-6


def test_compensated_oob_and_inert_atoms():
    """Restraint and scaling-0 semantics match evaluate_grid."""
    vals = RNG.standard_normal(COUNTS)
    grid = Grid.create(vals, SPACING, ORIGIN,
                       interp_method=InterpolationMethod.BSPLINE,
                       oob_k=1234.0, dtype=np.float64)
    cp = pack_grid_compensated(grid)
    lo = np.asarray(ORIGIN)
    hi = lo + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    pos = np.stack([lo - 0.25, hi + 0.4, lo + 0.5 * (hi - lo)])
    scal = np.array([1.0, 2.0, 0.0])
    ref = evaluate_grid(grid, pos, scal)
    got = evaluate_compensated(cp, pos, scal)
    np.testing.assert_allclose(np.asarray(got.per_atom_energy, np.float64),
                               np.asarray(ref.per_atom_energy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.forces, np.float64),
                               np.asarray(ref.forces), rtol=1e-6)


def test_compensated_exact_geometry_override():
    """A float32 Grid carries f32-ROUNDED origin/spacing; at large cell
    coordinates that rounding shifts the fraction by ~1e-7*t and costs
    ~20x the design floor on steep fields (found on the real canonical
    grids, r4). pack_grid_compensated(origin=, spacing=) must restore
    the exact-geometry accuracy."""
    from openmmgridforce_tpu.ops.gridgen import generate_grid

    spacing = 0.0125            # not exactly representable in f32
    counts = (96, 8, 8)
    origin = (1.00175115, 0.5328844699999999, 0.8606374500000002)
    rng = np.random.default_rng(5)
    rec = rng.uniform(0.3, 0.9, (8, 3)) + np.asarray(origin)
    rec[:, 0] += 0.7            # off-center: probes reach large t_x
    g64 = generate_grid(counts, (spacing,) * 3, origin, "lja", rec,
                        rng.uniform(0.05, 0.5, 8), np.full(8, 0.3),
                        np.full(8, 0.6), dtype=np.float64,
                        interp_method=InterpolationMethod.BSPLINE)
    g32 = dataclasses.replace(
        g64, vals=jnp.asarray(np.asarray(g64.vals), jnp.float32),
        spacing=jnp.asarray(np.asarray(g64.spacing), jnp.float32),
        origin=jnp.asarray(np.asarray(g64.origin), jnp.float32))
    # truth on the same stored data with exact geometry
    g64c = dataclasses.replace(
        g64, vals=jnp.asarray(np.asarray(g32.vals), jnp.float64))

    pos = np.stack([rng.uniform(origin[0] + 0.9, origin[0] + 1.15, 60),
                    rng.uniform(origin[1] + 0.02, origin[1] + 0.06, 60),
                    rng.uniform(origin[2] + 0.02, origin[2] + 0.06, 60)],
                   axis=1)
    scal = np.ones(60)
    truth = np.asarray(evaluate_grid(g64c, pos, scal).per_atom_energy)
    scale = np.abs(truth).max()

    rounded = evaluate_compensated(pack_grid_compensated(g32), pos, scal)
    exact = evaluate_compensated(
        pack_grid_compensated(g32, origin=origin, spacing=(spacing,) * 3),
        pos, scal)
    err_rounded = np.abs(np.asarray(rounded.per_atom_energy, np.float64)
                         - truth).max()
    err_exact = np.abs(np.asarray(exact.per_atom_energy, np.float64)
                       - truth).max()
    assert err_exact / scale < 1.5e-7, (err_exact, scale)
    # the rounded-geometry pack must be measurably worse on this field
    # (t_x ~ 75-90), or the test has lost its teeth
    assert err_rounded > 3 * err_exact, (err_rounded, err_exact)


def test_df_sum_tree_reduction():
    """df_sum must match an f64 sum to ~u^2*log2(N) — including odd
    lengths (zero padding) and mixed magnitudes that would collapse a
    plain f32 sum."""
    rng = np.random.default_rng(21)
    for n in (1, 2, 7, 1000, 4097):
        big = rng.standard_normal(n) * 1e6
        small = rng.standard_normal(n) * 1e-3
        x64 = big + small
        hi, lo = tf.df_from_f64(x64)
        s_hi, s_lo = jax.jit(tf.df_sum)((jnp.asarray(hi),
                                         jnp.asarray(lo)))
        got = np.float64(s_hi) + np.float64(s_lo)
        want = x64.sum()
        denom = max(abs(want), np.abs(x64).sum() * 1e-6)
        assert abs(got - want) / denom < 1e-11, (n, got, want)


def test_compensated_batched_replicas():
    """Leading batch axes (the pose-scoring shape [R, N, 3]) must give
    the same per-atom energies/forces as evaluating each replica
    separately, and the total must be the df sum over the whole batch."""
    grid = Grid.create(np.abs(RNG.standard_normal(COUNTS)) + 0.5,
                       SPACING, ORIGIN,
                       interp_method=InterpolationMethod.BSPLINE,
                       oob_k=99.0, dtype=np.float64)
    cp = pack_grid_compensated(grid)
    rng = np.random.default_rng(31)
    lo = np.asarray(ORIGIN)
    hi = lo + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    pos = rng.uniform(lo - 0.05, hi + 0.05, (4, 20, 3))
    scal = rng.standard_normal(20)

    batched = evaluate_compensated(cp, pos, scal)
    singles = [evaluate_compensated(cp, pos[r], scal) for r in range(4)]
    np.testing.assert_array_equal(
        np.asarray(batched.per_atom_energy),
        np.stack([np.asarray(s.per_atom_energy) for s in singles]))
    np.testing.assert_array_equal(
        np.asarray(batched.forces),
        np.stack([np.asarray(s.forces) for s in singles]))
    want_total = sum(float(s.energy) for s in singles)
    assert float(batched.energy) == pytest.approx(want_total, rel=1e-6)
