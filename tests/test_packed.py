"""PackedGrid (per-cell polynomial coefficients) parity with the
reference-layout evaluation, for all methods and inv-power modes."""

import numpy as np
import pytest

import jax.numpy as jnp

from openmmgridforce_tpu import Grid, InterpolationMethod, InvPowerMode
from openmmgridforce_tpu.ops import evaluate_grid
from openmmgridforce_tpu.ops.packed import evaluate_packed, pack_grid

RNG = np.random.default_rng(31)
COUNTS = (6, 7, 8)
SPACING = (0.11, 0.09, 0.13)
ORIGIN = (0.5, -0.2, 0.3)


def positions_everywhere(n=60):
    """Positions covering interior, cell edges, grid faces and outside."""
    lo = np.asarray(ORIGIN)
    hi = lo + (np.asarray(COUNTS) - 1) * np.asarray(SPACING)
    pts = [RNG.uniform(lo - 0.1, hi + 0.1, size=(n, 3))]
    # exactly on nodes and faces
    pts.append(lo + np.array([[0, 0, 0], [1, 2, 3], [4, 5, 6]])
               * np.asarray(SPACING))
    pts.append(np.array([hi, lo, [hi[0], lo[1], hi[2]]]))
    return np.concatenate(pts)


@pytest.mark.parametrize("method,needs_derivs,mode,n", [
    (InterpolationMethod.TRILINEAR, False, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.TRILINEAR, False, InvPowerMode.STORED, 2.0),
    (InterpolationMethod.TRILINEAR, False, InvPowerMode.RUNTIME, 2.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.STORED, 3.0),
    (InterpolationMethod.BSPLINE, False, InvPowerMode.RUNTIME, 2.0),
    (InterpolationMethod.TRICUBIC, True, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.TRICUBIC, True, InvPowerMode.RUNTIME, 2.0),
    (InterpolationMethod.TRIQUINTIC, True, InvPowerMode.NONE, 0.0),
    (InterpolationMethod.TRIQUINTIC, True, InvPowerMode.STORED, 2.0),
])
def test_packed_matches_reference_layout(method, needs_derivs, mode, n):
    vals = np.abs(RNG.standard_normal(COUNTS)) + 0.5  # positive (inv-power)
    derivs = RNG.standard_normal(COUNTS + (27,)) if needs_derivs else None
    if needs_derivs:
        derivs[..., 0] = vals
    grid = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, inv_power_mode=mode,
                       inv_power=n, oob_k=777.0, dtype=np.float64)
    packed = pack_grid(grid)

    pos = positions_everywhere()
    scaling = RNG.standard_normal(len(pos))
    scaling[3] = 0.0  # exercise the inert-atom branch

    ref = evaluate_grid(grid, pos, scaling)
    got = evaluate_packed(packed, pos, scaling)

    np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                               np.asarray(ref.per_atom_energy),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.forces),
                               np.asarray(ref.forces),
                               rtol=1e-8, atol=1e-8)
    assert float(got.energy) == pytest.approx(float(ref.energy), rel=1e-9)


def test_packed_float32_accuracy():
    """f32 packed evaluation should track the f64 reference within ~1e-5
    relative (the BASELINE parity budget)."""
    vals = RNG.standard_normal(COUNTS)
    grid64 = Grid.create(vals, SPACING, ORIGIN,
                         interp_method=InterpolationMethod.BSPLINE,
                         dtype=np.float64)
    grid32 = Grid.create(vals, SPACING, ORIGIN,
                         interp_method=InterpolationMethod.BSPLINE,
                         dtype=np.float32)
    packed32 = pack_grid(grid32)

    lo = np.asarray(ORIGIN) + 0.5 * np.asarray(SPACING)
    hi = (np.asarray(ORIGIN)
          + (np.asarray(COUNTS) - 1.5) * np.asarray(SPACING))
    pos = RNG.uniform(lo, hi, size=(50, 3))
    s = np.ones(50)
    ref = evaluate_grid(grid64, pos, s)
    got = evaluate_packed(packed32, pos.astype(np.float32),
                          s.astype(np.float32))
    scale = np.abs(np.asarray(ref.per_atom_energy)).max()
    err = np.abs(np.asarray(got.per_atom_energy, dtype=np.float64)
                 - np.asarray(ref.per_atom_energy)).max()
    assert err / scale < 1e-5


@pytest.mark.parametrize("method", [InterpolationMethod.TRILINEAR,
                                    InterpolationMethod.BSPLINE,
                                    InterpolationMethod.TRIQUINTIC])
def test_chunked_packing_matches_whole_grid(method):
    """x-slab chunked packing (for big grids) is bit-identical to
    whole-grid packing."""
    needs_derivs = method == InterpolationMethod.TRIQUINTIC
    vals = RNG.standard_normal(COUNTS)
    derivs = (RNG.standard_normal(COUNTS + (27,)) if needs_derivs
              else None)
    grid = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                       interp_method=method, dtype=np.float64)
    whole = pack_grid(grid)
    chunked = pack_grid(grid, x_chunk=2)
    np.testing.assert_allclose(np.asarray(chunked.coeffs),
                               np.asarray(whole.coeffs), rtol=1e-12,
                               atol=1e-13)


class TestHermitePacked:
    """Hermite-packed rows: one gather per atom, bounded basis."""

    def _steep_grid(self, method, dtype=np.float64):
        # a steep capped field (receptor-core-like): the conditioning
        # stressor that breaks the f32 MONOMIAL triquintic pack
        rng = np.random.default_rng(7)
        rec = rng.uniform(0.2, 0.8, (12, 3))
        q = rng.uniform(-0.5, 0.5, 12)
        from openmmgridforce_tpu.ops.gridgen import generate_grid
        return generate_grid((10, 10, 10), (0.05,) * 3, (0.0,) * 3,
                             "ljr", rec, np.abs(q), np.full(12, 0.3),
                             np.full(12, 0.6), compute_derivatives=True,
                             interp_method=method, dtype=dtype)

    @pytest.mark.parametrize("method", [InterpolationMethod.TRICUBIC,
                                        InterpolationMethod.TRIQUINTIC])
    def test_f64_exact_vs_direct(self, method):
        from openmmgridforce_tpu.ops.packed import (
            evaluate_hermite_packed, pack_grid_hermite)

        g = self._steep_grid(method)
        rng = np.random.default_rng(8)
        pos = rng.uniform(0.02, 0.43, (50, 3))
        scal = rng.uniform(-1.0, 1.0, 50)
        a = evaluate_grid(g, pos, scal)
        b = evaluate_hermite_packed(pack_grid_hermite(g), pos, scal)
        np.testing.assert_array_equal(np.asarray(a.forces),
                                      np.asarray(b.forces))
        np.testing.assert_array_equal(float(a.energy), float(b.energy))

    def test_f32_conditioning_beats_monomial_pack(self):
        """On a steep capped triquintic field, the f32 Hermite pack must
        stay within 1e-5 relative of the f64 truth; quantify the f32
        monomial pack's error alongside (documented weakness)."""
        from openmmgridforce_tpu.ops.packed import (
            evaluate_hermite_packed, evaluate_packed, pack_grid,
            pack_grid_hermite)

        g64 = self._steep_grid(InterpolationMethod.TRIQUINTIC)
        import dataclasses
        g32 = dataclasses.replace(
            g64, vals=jnp.asarray(g64.vals, jnp.float32),
            derivs=jnp.asarray(g64.derivs, jnp.float32),
            spacing=jnp.asarray(g64.spacing, jnp.float32),
            origin=jnp.asarray(g64.origin, jnp.float32))
        rng = np.random.default_rng(9)
        pos = rng.uniform(0.02, 0.43, (200, 3))
        scal = np.ones(200)

        truth = np.asarray(evaluate_grid(g64, pos, scal).per_atom_energy)
        scale = np.abs(truth).max()

        hp32 = evaluate_hermite_packed(pack_grid_hermite(g32),
                                       pos.astype(np.float32),
                                       scal.astype(np.float32))
        err_h = np.abs(np.asarray(hp32.per_atom_energy) - truth).max()
        mp32 = evaluate_packed(pack_grid(g32), pos.astype(np.float32),
                               scal.astype(np.float32))
        err_m = np.abs(np.asarray(mp32.per_atom_energy) - truth).max()

        assert err_h / scale < 1e-5, (err_h, scale)
        # the monomial pack's conditioning gap is real: hermite-packed
        # must be at least 10x tighter on this field
        assert err_h * 10 < err_m or err_m / scale < 1e-6, (err_h, err_m)


def test_hermite_multi_fused_matches_separate():
    """combine_hermite_packed: one gather serves all co-located grids,
    exactly equal to summing the separate hermite-packed evaluations."""
    from openmmgridforce_tpu.ops.gridgen import generate_grid
    from openmmgridforce_tpu.ops.packed import (combine_hermite_packed,
                                                evaluate_hermite_multi,
                                                evaluate_hermite_packed,
                                                pack_grid_hermite)

    rng = np.random.default_rng(12)
    rec = rng.uniform(0.1, 0.9, (8, 3))
    q = np.abs(rng.uniform(-0.4, 0.4, 8))
    gs = [generate_grid((8, 7, 9), (0.1, 0.11, 0.09), (0.0,) * 3, t, rec,
                        q, np.full(8, 0.3), np.full(8, 0.5),
                        compute_derivatives=True,
                        interp_method=InterpolationMethod.TRIQUINTIC,
                        dtype=np.float64)
          for t in ("charge", "ljr", "lja")]
    hps = [pack_grid_hermite(g) for g in gs]
    multi = combine_hermite_packed(hps)
    pos = rng.uniform(-0.1, 0.9, (40, 3))     # includes OOB atoms
    s = rng.uniform(-1.0, 1.0, (3, 40))
    got = evaluate_hermite_multi(multi, pos, s)
    want_pa = sum(np.asarray(
        evaluate_hermite_packed(hp, pos, s[i]).per_atom_energy)
        for i, hp in enumerate(hps))
    # separate evals triple-count the OOB restraint; fused applies once
    inside = np.all((pos >= 0) & (pos <= np.asarray([0.7, 0.66, 0.72])),
                    axis=1)
    np.testing.assert_allclose(
        np.asarray(got.per_atom_energy)[inside], want_pa[inside],
        atol=1e-12)
    # in-bounds forces identical
    want_f = sum(np.asarray(evaluate_hermite_packed(hp, pos, s[i]).forces)
                 for i, hp in enumerate(hps))
    np.testing.assert_allclose(np.asarray(got.forces)[inside],
                               want_f[inside], atol=1e-12)


class TestChebyshevBasis:
    """pack_grid(poly_basis='chebyshev'): same per-cell row layout and
    evaluation cost, but coefficients bounded ~max|P| — the conditioning
    fix for f32 triquintic."""

    def _grid(self, dtype=np.float64):
        from openmmgridforce_tpu.ops.gridgen import generate_grid
        rng = np.random.default_rng(7)
        rec = rng.uniform(0.2, 0.8, (12, 3))
        q = np.abs(rng.uniform(-0.5, 0.5, 12))
        return generate_grid((10, 10, 10), (0.05,) * 3, (0.0,) * 3,
                             "ljr", rec, q, np.full(12, 0.3),
                             np.full(12, 0.6), compute_derivatives=True,
                             interp_method=InterpolationMethod.TRIQUINTIC,
                             dtype=dtype)

    @pytest.mark.parametrize("method", [InterpolationMethod.TRILINEAR,
                                        InterpolationMethod.BSPLINE,
                                        InterpolationMethod.TRICUBIC,
                                        InterpolationMethod.TRIQUINTIC])
    def test_f64_matches_direct(self, method):
        from openmmgridforce_tpu.ops.gridgen import generate_grid
        from openmmgridforce_tpu.ops.packed import (evaluate_packed,
                                                    pack_grid)
        rng = np.random.default_rng(13)
        rec = rng.uniform(0.1, 0.7, (8, 3))
        g = generate_grid((8, 7, 9), (0.1, 0.11, 0.09), (0.0,) * 3,
                          "charge", rec, rng.uniform(-0.4, 0.4, 8),
                          np.full(8, 0.3), np.full(8, 0.5),
                          compute_derivatives=True, interp_method=method,
                          dtype=np.float64)
        pos = rng.uniform(-0.05, 0.8, (50, 3))
        scal = rng.uniform(-1.0, 1.0, 50)
        want = evaluate_grid(g, pos, scal)
        got = evaluate_packed(pack_grid(g, poly_basis="chebyshev"),
                              pos, scal)
        np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                                   np.asarray(want.per_atom_energy),
                                   rtol=1e-11, atol=1e-11)
        np.testing.assert_allclose(np.asarray(got.forces),
                                   np.asarray(want.forces),
                                   rtol=1e-10, atol=1e-10)

    def test_f32_conditioning_beats_monomial(self):
        import dataclasses

        from openmmgridforce_tpu.ops.packed import (evaluate_packed,
                                                    pack_grid)
        g64 = self._grid()
        g32 = dataclasses.replace(
            g64, vals=jnp.asarray(g64.vals, jnp.float32),
            derivs=jnp.asarray(g64.derivs, jnp.float32),
            spacing=jnp.asarray(g64.spacing, jnp.float32),
            origin=jnp.asarray(g64.origin, jnp.float32))
        rng = np.random.default_rng(9)
        pos = rng.uniform(0.02, 0.43, (200, 3))
        scal = np.ones(200)
        truth = np.asarray(evaluate_grid(g64, pos, scal).per_atom_energy)
        scale = np.abs(truth).max()
        p32, s32 = pos.astype(np.float32), scal.astype(np.float32)
        e_m = np.abs(np.asarray(evaluate_packed(
            pack_grid(g32, poly_basis="monomial"), p32,
            s32).per_atom_energy) - truth).max()
        e_c = np.abs(np.asarray(evaluate_packed(
            pack_grid(g32, poly_basis="chebyshev"), p32,
            s32).per_atom_energy) - truth).max()
        assert e_c / scale < 1e-6, (e_c, scale)
        assert e_c * 5 < e_m, (e_c, e_m)   # measured 10x tighter

    def test_auto_default_basis(self):
        """f32 Hermite packs default to chebyshev; everything else
        stays monomial (pack_grid poly_basis=None resolution)."""
        import dataclasses

        from openmmgridforce_tpu.ops.packed import pack_grid
        g64 = self._grid()
        g32 = dataclasses.replace(
            g64, vals=jnp.asarray(g64.vals, jnp.float32),
            derivs=jnp.asarray(g64.derivs, jnp.float32),
            spacing=jnp.asarray(g64.spacing, jnp.float32),
            origin=jnp.asarray(g64.origin, jnp.float32))
        assert pack_grid(g32).poly_basis == "chebyshev"
        assert pack_grid(g64).poly_basis == "monomial"
        assert pack_grid(g64, dtype=jnp.float32).poly_basis == "chebyshev"
        gb = dataclasses.replace(
            g32, interp_method=InterpolationMethod.BSPLINE, derivs=None)
        assert pack_grid(gb).poly_basis == "monomial"

    def test_fused_and_sharded_chebyshev(self):
        import jax
        from jax.sharding import Mesh

        from openmmgridforce_tpu.ops.gridgen import generate_grid
        from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                    evaluate_multi,
                                                    pack_grid)
        from openmmgridforce_tpu.parallel.sharded_grid import (
            make_sharded_grid_eval, shard_packed_grid)

        rng = np.random.default_rng(14)
        rec = rng.uniform(0.1, 0.7, (8, 3))
        gs = [generate_grid((9, 7, 8), (0.1, 0.11, 0.09), (0.0,) * 3, t,
                            rec, np.abs(rng.uniform(-0.4, 0.4, 8)),
                            np.full(8, 0.3), np.full(8, 0.5),
                            compute_derivatives=True,
                            interp_method=InterpolationMethod.TRIQUINTIC,
                            dtype=np.float64)
              for t in ("charge", "lja")]
        multi = combine_packed_grids(
            [pack_grid(g, poly_basis="chebyshev") for g in gs])
        assert multi.poly_basis == "chebyshev"
        # inside atoms only: the fused eval applies the OOB restraint
        # ONCE per set while the per-grid sum applies it per grid
        hi = (np.asarray((9, 7, 8)) - 1) * np.asarray((0.1, 0.11, 0.09))
        pos = rng.uniform(0.02, hi - 0.02, (32, 3))
        s = rng.uniform(-1.0, 1.0, (2, 32))
        want = sum(np.asarray(evaluate_grid(g, pos, s[i]).per_atom_energy)
                   for i, g in enumerate(gs))
        got = evaluate_multi(multi, pos, s)
        # basis round-trip amplifies by the conversion matrix norm (~512)
        np.testing.assert_allclose(np.asarray(got.per_atom_energy), want,
                                   rtol=1e-9, atol=1e-9)

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
        sharded = shard_packed_grid(multi, mesh)
        assert sharded.poly_basis == "chebyshev"
        got_s = jax.jit(make_sharded_grid_eval(mesh))(
            sharded, jnp.asarray(pos), jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(got_s.per_atom_energy),
                                   np.asarray(got.per_atom_energy),
                                   rtol=1e-12, atol=1e-12)


def test_pack_grids_fused_matches_combine():
    """pack_grids_fused (direct slab assembly into the fused table —
    the canonical-scale path that avoids the combine-time 2x HBM peak
    and the TPU compiler's multi-GB lane-concatenate crash) must produce
    the same evaluation as pack_grid + combine_packed_grids, chunked or
    not, at any lane_pad."""
    from openmmgridforce_tpu.ops.gridgen import generate_grid
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                evaluate_multi, pack_grid,
                                                pack_grids_fused)

    rng = np.random.default_rng(9)
    rec = rng.uniform(0.1, 0.9, (10, 3))
    gs = [generate_grid((12, 10, 11), (0.09, 0.1, 0.08), (0.0,) * 3, t,
                        rec, rng.uniform(-0.4, 0.4, 10),
                        np.full(10, 0.3), np.full(10, 0.5),
                        interp_method=InterpolationMethod.BSPLINE,
                        dtype=np.float64)
          for t in ("charge", "ljr", "lja")]
    ref = combine_packed_grids([pack_grid(g) for g in gs])
    pos = rng.uniform(0.05, 0.7, (25, 3))
    s = rng.uniform(-1.0, 1.0, (3, 25))
    want = evaluate_multi(ref, pos, s)
    for kw in ({}, {"x_chunk": 3}, {"lane_pad": 128}):
        multi = pack_grids_fused(gs, **kw)
        assert multi.coeffs.shape[0] == ref.coeffs.shape[0]
        got = evaluate_multi(multi, pos, s)
        np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                                   np.asarray(want.per_atom_energy),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.forces),
                                   np.asarray(want.forces),
                                   rtol=0, atol=1e-11)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="derivatives"):
        import dataclasses
        pack_grids_fused([dataclasses.replace(
            gs[0], interp_method=InterpolationMethod.TRICUBIC)])


def test_singleton_fused_pack_matches_pack_grid():
    """A SINGLE grid packed via pack_grids_fused([g], lane_pad=128) (the
    128-lane-padded singleton the BPMF sampler uses in its pair-fusion
    split — XLA:TPU copy-inserted a padded duplicate of a 64-lane
    canonical-scale argument, r5 bpmf OOM) must evaluate identically to
    the plain pack_grid binding."""
    from openmmgridforce_tpu.ops.gridgen import generate_grid
    from openmmgridforce_tpu.ops.packed import (evaluate_multi,
                                                evaluate_packed, pack_grid,
                                                pack_grids_fused)

    rng = np.random.default_rng(11)
    rec = rng.uniform(0.1, 0.9, (10, 3))
    g = generate_grid((12, 10, 11), (0.09, 0.1, 0.08), (0.0,) * 3, "lja",
                      rec, rng.uniform(-0.4, 0.4, 10),
                      np.full(10, 0.3), np.full(10, 0.5),
                      interp_method=InterpolationMethod.BSPLINE,
                      dtype=np.float64)
    pos = rng.uniform(0.05, 0.7, (25, 3))
    scal = rng.uniform(-1.0, 1.0, 25)
    want = evaluate_packed(pack_grid(g), pos, scal)
    multi = pack_grids_fused([g], lane_pad=128)
    assert multi.coeffs.shape[1] == 128
    got = evaluate_multi(multi, pos, scal[None, :])
    np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                               np.asarray(want.per_atom_energy),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.forces),
                               np.asarray(want.forces),
                               rtol=0, atol=1e-11)
