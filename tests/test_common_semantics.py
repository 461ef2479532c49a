"""Common-platform (Q6) and CUDA-tiled (Q7) quirk modes.

With these, the quirk matrix of SURVEY section 2.6 is two-sided: every
reference platform's divergent behavior is either the default or an
explicit, test-covered mode."""

import numpy as np
import pytest

import jax.numpy as jnp

import openmmgridforce_tpu.api as gfp
from openmmgridforce_tpu.grid import Grid, InterpolationMethod
from openmmgridforce_tpu.ops.common_semantics import evaluate_grid_common
from openmmgridforce_tpu.ops.interpolate import evaluate_grid

RNG = np.random.default_rng(23)

COUNTS = (9, 9, 9)
SPACING = (0.1, 0.1, 0.1)
ORIGIN = (0.0, 0.0, 0.0)


def _grid(inv_power=0.0, vals=None, method=InterpolationMethod.BSPLINE):
    if vals is None:
        vals = RNG.standard_normal(COUNTS) * 3.0
    return Grid.create(vals, SPACING, ORIGIN, interp_method=method,
                       inv_power=inv_power,
                       inv_power_mode=(2 if inv_power else 0),
                       dtype=np.float64)


def test_common_matches_default_inside_box():
    """With no inverse power and all atoms inside, common semantics is
    identical to the default kernel (same basis functions)."""
    g = _grid()
    pos = RNG.uniform(0.15, 0.65, (12, 3))
    s = RNG.uniform(0.5, 1.5, 12)
    a = evaluate_grid(g, pos, s)
    b = evaluate_grid_common(g, pos, s)
    np.testing.assert_allclose(np.asarray(b.per_atom_energy),
                               np.asarray(a.per_atom_energy), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.forces),
                               np.asarray(a.forces), atol=1e-12)


def test_q6_oob_force_scaled_energy_unscaled():
    """Q6 (gridForce.cc:214-217): restraint ENERGY is the standard
    1/2 k d^2 but the restraint FORCE is multiplied by the scaling
    factor — unlike the reference/CUDA kernels ("Don't scale",
    gridForce.cu:480-482)."""
    g = _grid()
    pos = np.array([[1.0, 0.4, 0.4]])      # 0.2 nm outside +x face
    s = np.array([2.5])
    res = evaluate_grid_common(g, pos, s)
    e = 0.5 * g.oob_k * 0.2 ** 2
    np.testing.assert_allclose(float(res.per_atom_energy[0]), e,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.forces[0]),
                               [-2.5 * g.oob_k * 0.2, 0.0, 0.0],
                               rtol=1e-12)
    # the default kernel does NOT scale the restraint force
    ref = evaluate_grid(g, pos, s)
    np.testing.assert_allclose(np.asarray(ref.forces[0]),
                               [-g.oob_k * 0.2, 0.0, 0.0], rtol=1e-12)


def test_q6_zero_scaling_atom_fully_skipped():
    """gridForce.cc:40-45: a scaling-0 atom contributes NOTHING, even
    the restraint (the default kernel still restrains it)."""
    g = _grid()
    pos = np.array([[1.0, 0.4, 0.4]])
    res = evaluate_grid_common(g, pos, np.array([0.0]))
    assert float(res.energy) == 0.0
    np.testing.assert_array_equal(np.asarray(res.forces), 0.0)
    ref = evaluate_grid(g, pos, np.array([0.0]))
    assert float(ref.per_atom_energy[0]) > 0.0


def test_common_bare_pow_inverse_power():
    """gridForce.cc:180-187: invPower > 0 is a bare pow (no sign
    handling, no mode check)."""
    vals = RNG.uniform(0.5, 4.0, COUNTS)    # positive field
    g2 = _grid(inv_power=2.0, vals=vals)
    g0 = _grid(inv_power=0.0, vals=vals)
    pos = RNG.uniform(0.2, 0.6, (6, 3))
    s = np.ones(6)
    raw = np.asarray(evaluate_grid_common(g0, pos, s).per_atom_energy)
    out = np.asarray(evaluate_grid_common(g2, pos, s).per_atom_energy)
    np.testing.assert_allclose(out, raw ** 2, rtol=1e-10)


def test_common_rejects_hermite():
    vals = RNG.standard_normal(COUNTS)
    derivs = RNG.standard_normal(COUNTS + (27,))
    g = Grid.create(vals, SPACING, ORIGIN, derivs=derivs,
                    interp_method=InterpolationMethod.TRICUBIC,
                    dtype=np.float64)
    with pytest.raises(ValueError, match="trilinear and B-spline"):
        evaluate_grid_common(g, np.zeros((1, 3)), np.ones(1))


def test_platform_common_through_context():
    """Platform('Common') selects the common kernel semantics in the
    compat API (restraint force scaled by the scaling factor)."""
    from tests.test_api import _synthetic_topology
    n = 6
    q = RNG.uniform(0.2, 0.5, n)
    top, q, sig, eps = (_synthetic_topology(n, q,
                                            np.full(n, 0.3),
                                            np.full(n, 0.4)), q,
                        np.full(n, 0.3), np.full(n, 0.4))
    pos = RNG.uniform(0.1, 0.7, (n, 3))
    pos[0] = [1.3, 0.4, 0.4]              # 0.5 nm outside +x
    rec_pos = RNG.uniform(0.2, 0.6, (n, 3))

    def build(platform):
        system = gfp.create_system(top)
        g = gfp.GridForce()
        g.addGridCounts(*COUNTS)
        g.addGridSpacing(*SPACING)
        g.setGridOrigin(*ORIGIN)
        g.setAutoGenerateGrid(True)
        g.setGridType("charge")
        g.setReceptorAtoms(list(range(n)))
        g.setReceptorPositionsFromLists(rec_pos)
        g.setScalingFactors(q)
        system.addForce(g)
        ctx = gfp.Context(system, gfp.VerletIntegrator(0.001),
                          gfp.Platform.getPlatformByName(platform))
        ctx.setPositions(pos)
        return ctx

    f_common = build("Common").getState(getForces=True).getForces()
    f_cuda = build("CUDA").getState(getForces=True).getForces()
    k = gfp.GridForce().getOutOfBoundsRestraint()
    # atom 0 is 0.5 nm outside: common scales the restraint force by
    # q[0] while the default kernel does not; every other force term
    # (the system's NonbondedForce) is identical, so the difference
    # between platforms isolates Q6 exactly
    np.testing.assert_allclose(f_common[0, 0] - f_cuda[0, 0],
                               (1.0 - q[0]) * k * 0.5, rtol=1e-9)
    np.testing.assert_allclose(f_common[1:], f_cuda[1:], atol=1e-9)


def test_q7_cuda_tiled_oob_convention(tmp_path):
    """Q7 (gridForceTiled.cu:522-550): tiled-kernel OOB restraint is
    E = k d^2, F = -2 k dev — exactly a doubled stiffness, opt-in via
    oob_convention='cuda-tiled'."""
    from openmmgridforce_tpu.io import write_grid_tiled
    from openmmgridforce_tpu.io.streaming import StreamedGridEvaluator
    g = _grid()
    path = str(tmp_path / "q7.tiled")
    write_grid_tiled(path, g, tile_size=4)
    pos = np.array([[1.0, 0.4, 0.4]])     # 0.2 nm outside +x
    s = np.array([1.0])
    ref = StreamedGridEvaluator(path, InterpolationMethod.BSPLINE)
    tiled = StreamedGridEvaluator(path, InterpolationMethod.BSPLINE,
                                  oob_convention="cuda-tiled")
    e_ref = float(ref.evaluate(pos, s).per_atom_energy[0])
    r_t = tiled.evaluate(pos, s)
    k = g.oob_k
    np.testing.assert_allclose(e_ref, 0.5 * k * 0.04, rtol=1e-6)
    np.testing.assert_allclose(float(r_t.per_atom_energy[0]),
                               k * 0.04, rtol=1e-6)
    np.testing.assert_allclose(float(r_t.forces[0, 0]), -2 * k * 0.2,
                               rtol=1e-6)
    with pytest.raises(ValueError):
        StreamedGridEvaluator(path, InterpolationMethod.BSPLINE,
                              oob_convention="bogus")
