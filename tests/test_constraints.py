"""SHAKE/RATTLE constraints: satisfaction, MD integration, vmap."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.mm import (energy_and_forces, initialize_state,
                                    load_inpcrd, load_prmtop,
                                    make_langevin_step, run_segment,
                                    system_from_amber)
from openmmgridforce_tpu.mm.constraints import (ConstraintSet, apply_rattle,
                                                apply_shake,
                                                constraints_from_bonds)

DATA = "/root/reference/python/prmtopcrd"
HAVE_FIXTURES = os.path.exists(f"{DATA}/ligand.prmtop")
RNG = np.random.default_rng(17)


def simple_constraints():
    # water-like: O(16) with two H(1) at 0.1 nm
    idx = np.array([[0, 1], [0, 2]])
    length = np.array([0.1, 0.1])
    masses = np.array([16.0, 1.0, 1.0])
    return ConstraintSet(idx=jnp.asarray(idx, jnp.int32),
                         length=jnp.asarray(length),
                         inv_mass=jnp.asarray(1.0 / masses))


def test_shake_restores_lengths():
    cs = simple_constraints()
    x_ref = jnp.asarray([[0.0, 0.0, 0.0],
                         [0.1, 0.0, 0.0],
                         [0.0, 0.1, 0.0]])
    x_new = x_ref + jnp.asarray(RNG.uniform(-0.02, 0.02, (3, 3)))
    x_c = apply_shake(cs, x_ref, x_new)
    d1 = float(jnp.linalg.norm(x_c[0] - x_c[1]))
    d2 = float(jnp.linalg.norm(x_c[0] - x_c[2]))
    assert d1 == pytest.approx(0.1, abs=2e-5)
    assert d2 == pytest.approx(0.1, abs=2e-5)


def test_rattle_removes_bond_velocity():
    cs = simple_constraints()
    x = jnp.asarray([[0.0, 0.0, 0.0],
                     [0.1, 0.0, 0.0],
                     [0.0, 0.1, 0.0]])
    v = jnp.asarray(RNG.standard_normal((3, 3)))
    v_c = apply_rattle(cs, x, v)
    for (i, j) in [(0, 1), (0, 2)]:
        d = x[i] - x[j]
        vrel = float(jnp.dot(v_c[i] - v_c[j], d))
        assert abs(vrel) < 1e-7


def test_shake_conserves_momentum():
    cs = simple_constraints()
    x_ref = jnp.asarray([[0.0, 0.0, 0.0],
                         [0.1, 0.0, 0.0],
                         [0.0, 0.1, 0.0]])
    x_new = x_ref + jnp.asarray(RNG.uniform(-0.02, 0.02, (3, 3)))
    x_c = apply_shake(cs, x_ref, x_new)
    m = 1.0 / np.asarray(cs.inv_mass)
    com_before = (m[:, None] * np.asarray(x_new)).sum(0)
    com_after = (m[:, None] * np.asarray(x_c)).sum(0)
    np.testing.assert_allclose(com_after, com_before, atol=1e-12)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_hbonds_md_keeps_bonds_fixed():
    """Langevin MD at 2 fs with HBonds constraints: H-bond lengths stay at
    their equilibrium values (the reference sampler's configuration)."""
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(top, hydrogen_mass=4.0,
                               constraints="HBonds")
    cs = system.constraints
    assert cs.num_constraints > 0
    # constrained bonds were removed from the harmonic terms
    assert system.bond_idx.shape[0] + cs.num_constraints == \
        top.bond_idx.shape[0]

    def force_fn(x):
        return energy_and_forces(system, [], x)[1]

    step = make_langevin_step(force_fn, system.masses, dt=0.002,
                              friction=5.0, temperature=300.0,
                              constraints=cs)
    state = initialize_state(jax.random.PRNGKey(0), jnp.asarray(crd),
                             system.masses, 300.0)
    state = jax.jit(lambda s: run_segment(step, s, 500))(state)

    x = np.asarray(state.positions)
    i, j = np.asarray(cs.idx[:, 0]), np.asarray(cs.idx[:, 1])
    d = np.linalg.norm(x[i] - x[j], axis=1)
    np.testing.assert_allclose(d, np.asarray(cs.length), rtol=5e-4)
    assert np.all(np.isfinite(x))


def test_constraints_under_vmap():
    cs = simple_constraints()
    x_ref = jnp.asarray([[0.0, 0.0, 0.0],
                         [0.1, 0.0, 0.0],
                         [0.0, 0.1, 0.0]])
    x_new = x_ref[None] + jnp.asarray(RNG.uniform(-0.02, 0.02, (5, 3, 3)))
    x_c = jax.vmap(lambda xn: apply_shake(cs, x_ref, xn))(x_new)
    d = np.linalg.norm(np.asarray(x_c[:, 0] - x_c[:, 1]), axis=1)
    np.testing.assert_allclose(d, 0.1, atol=2e-5)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_static_iters_matches_while(monkeypatch):
    """OPENMMGRIDFORCE_SHAKE_STATIC=n replaces the lax.while_loop with n
    straight-line Jacobi sweeps (no inner `while` in the compiled
    program — the XLA:TPU copy-insertion workaround measured in the r5
    BPMF OOM). At convergence the fixed point is identical: both solvers
    must land on the same constrained positions/velocities."""
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(top, hydrogen_mass=4.0,
                               constraints="HBonds")
    cs = system.constraints
    rng = np.random.default_rng(3)
    x_ref = jnp.asarray(crd)
    x_new = jnp.asarray(crd + rng.normal(0, 0.008, crd.shape))
    v = jnp.asarray(rng.normal(0, 0.5, crd.shape))

    x_while = apply_shake(cs, x_ref, x_new)
    v_while = apply_rattle(cs, x_while, v)
    monkeypatch.setenv("OPENMMGRIDFORCE_SHAKE_STATIC", "32")
    x_static = apply_shake(cs, x_ref, x_new)
    v_static = apply_rattle(cs, x_static, v)

    # both satisfy the constraints...
    i, j = np.asarray(cs.idx[:, 0]), np.asarray(cs.idx[:, 1])
    for x in (x_while, x_static):
        d = np.linalg.norm(np.asarray(x)[i] - np.asarray(x)[j], axis=1)
        np.testing.assert_allclose(d, np.asarray(cs.length), rtol=5e-5)
    # ...and agree with each other to the while version's convergence
    # tolerance (the while stops at err <= 2e-5; the static solver runs
    # past it toward the exact fixed point, so they differ by up to the
    # early-stop slop, not by solution)
    np.testing.assert_allclose(np.asarray(x_static), np.asarray(x_while),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_static), np.asarray(v_while),
                               atol=1e-4)
