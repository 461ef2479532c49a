"""MD layer: AMBER parsing, pair table, integrators, end-to-end slice."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.mm import (GridBinding, MDState, energy_and_forces,
                                    initialize_state,
                                    instantaneous_temperature, load_inpcrd,
                                    load_prmtop, make_langevin_step,
                                    make_verlet_step, potential_energy,
                                    run_segment, run_trajectory,
                                    system_from_amber)
from openmmgridforce_tpu.ops import gridgen
from openmmgridforce_tpu.ops.pairwise import (build_pair_table,
                                              pair_energy_forces)
from openmmgridforce_tpu.units import BOLTZ, COULOMB_CONST

DATA = "/root/reference/python/prmtopcrd"
RNG = np.random.default_rng(5)


# ----------------------------------------------------------------------
# pair table
# ----------------------------------------------------------------------

def test_pair_energy_matches_bruteforce():
    n = 8
    q = RNG.uniform(-1, 1, n)
    sig = RNG.uniform(0.2, 0.4, n)
    eps = RNG.uniform(0.1, 1.0, n)
    exclusions = [(0, 1), (2, 3)]
    exceptions = [(1, 4, 0.05, 0.3, 0.2)]
    x = RNG.uniform(0, 1.5, (n, 3))

    table = build_pair_table(q, sig, eps, exclusions, exceptions)
    e, f = pair_energy_forces(table, x)

    want = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in exclusions:
                continue
            if (i, j) == (1, 4):
                qq, s, ep = 0.05, 0.3, 0.2
            else:
                qq = q[i] * q[j]
                s = 0.5 * (sig[i] + sig[j])
                ep = np.sqrt(eps[i] * eps[j])
            r = np.linalg.norm(x[i] - x[j])
            sr6 = (s / r) ** 6
            want += COULOMB_CONST * qq / r + 4 * ep * (sr6 ** 2 - sr6)
    assert float(e) == pytest.approx(want, rel=1e-10)

    g = jax.grad(lambda p: pair_energy_forces(table, p)[0])(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-9,
                               atol=1e-10)


# ----------------------------------------------------------------------
# AMBER parsing
# ----------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(f"{DATA}/ligand.prmtop"),
                    reason="fixtures not available")
def test_load_ligand_prmtop():
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    assert top.natom == crd.shape[0]
    assert top.natom > 0
    # sane physical values
    assert np.all(top.masses > 0)
    assert abs(top.charges.sum()) < 2.0       # near-integer total charge
    assert np.all(top.sigmas > 0.05) and np.all(top.sigmas < 1.0)
    assert np.all(top.epsilons >= 0)
    assert len(top.bond_idx) >= top.natom - 1
    assert len(top.exclusions) > 0
    # bond lengths near equilibrium in the crystal pose
    d = np.linalg.norm(crd[top.bond_idx[:, 0]] - crd[top.bond_idx[:, 1]],
                       axis=1)
    assert np.all(np.abs(d - top.bond_r0) < 0.02)


@pytest.mark.skipif(not os.path.exists(f"{DATA}/ligand.prmtop"),
                    reason="fixtures not available")
def test_ligand_system_energy_finite_and_forces_consistent():
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(top)
    e, f = energy_and_forces(system, [], jnp.asarray(crd))
    assert np.isfinite(float(e))
    g = jax.grad(lambda x: potential_energy(system, [], x))(jnp.asarray(crd))
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), rtol=1e-8,
                               atol=1e-8)


def test_hydrogen_mass_repartitioning_conserves_total_mass():
    if not os.path.exists(f"{DATA}/ligand.prmtop"):
        pytest.skip("fixtures not available")
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    s0 = system_from_amber(top)
    s4 = system_from_amber(top, hydrogen_mass=4.0)
    assert float(jnp.sum(s0.masses)) == pytest.approx(
        float(jnp.sum(s4.masses)), rel=1e-10)
    h = np.asarray(top.masses) < 2.0
    assert np.all(np.asarray(s4.masses)[h] == 4.0)


# ----------------------------------------------------------------------
# integrators
# ----------------------------------------------------------------------

def _harmonic_force(k):
    return lambda x: -k * x


def test_verlet_conserves_energy_harmonic():
    masses = jnp.asarray([1.5])
    k = 100.0
    x0 = jnp.asarray([[0.1, 0.0, -0.05]])
    state = MDState(x0, jnp.zeros((1, 3)), jax.random.PRNGKey(0))
    step = make_verlet_step(_harmonic_force(k), masses, dt=0.001)
    final = run_segment(step, state, 2000)

    def total_e(s):
        pe = 0.5 * k * jnp.sum(s.positions ** 2)
        ke = 0.5 * jnp.sum(masses[:, None] * s.velocities ** 2)
        return float(pe + ke)

    assert total_e(final) == pytest.approx(total_e(state), rel=1e-4)


@pytest.mark.parametrize("scheme", ["classic", "middle"])
def test_langevin_thermalizes_harmonic(scheme):
    """Average KE of a 3-D harmonic oscillator ensemble must approach
    (3/2) kT per particle."""
    n = 256
    masses = jnp.ones(n) * 2.0
    temperature = 300.0
    k_spring = 1000.0
    state = initialize_state(jax.random.PRNGKey(1),
                             jnp.zeros((n, 3)), masses, temperature)
    step = make_langevin_step(_harmonic_force(k_spring), masses, dt=0.002,
                              friction=5.0, temperature=temperature,
                              scheme=scheme)
    state = run_segment(jax.jit(step), state, 2000)
    temps = []
    for _ in range(20):
        state = run_segment(jax.jit(step), state, 100)
        temps.append(float(instantaneous_temperature(state, masses)))
    mean_t = np.mean(temps)
    assert mean_t == pytest.approx(temperature, rel=0.1), temps


# ----------------------------------------------------------------------
# end-to-end slice: ligand Langevin MD on a generated grid
# ----------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(f"{DATA}/ligand.prmtop"),
                    reason="fixtures not available")
def test_end_to_end_ligand_on_grid():
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    system = system_from_amber(top)

    # small synthetic receptor field around the ligand
    lo = crd.min(axis=0) - 0.4
    spacing = (0.05, 0.05, 0.05)
    counts = tuple(int(c) for c in
                   np.ceil((crd.max(axis=0) + 0.4 - lo) / spacing) + 1)
    rec_pos = crd.mean(axis=0, keepdims=True) + np.array([[0.6, 0.0, 0.0]])
    grid = gridgen.generate_grid(counts, spacing, lo, "charge", rec_pos,
                                 np.array([1.0]), np.array([0.3]),
                                 np.array([0.5]), dtype=jnp.float64)
    scaling = jnp.asarray(top.charges)
    binding = GridBinding(grid=grid, scaling=scaling)

    e0, f0 = energy_and_forces(system, [binding], jnp.asarray(crd))
    assert np.isfinite(float(e0))
    assert np.all(np.isfinite(np.asarray(f0)))

    def force_fn(x):
        return energy_and_forces(system, [binding], x)[1]

    state = initialize_state(jax.random.PRNGKey(2), jnp.asarray(crd),
                             system.masses, 300.0)
    step = make_langevin_step(force_fn, system.masses, dt=0.001,
                              friction=1.0, temperature=300.0)
    final, traj = jax.jit(
        lambda s: run_trajectory(step, s, 100, record_every=10))(state)
    assert traj.shape == (10, top.natom, 3)
    assert np.all(np.isfinite(np.asarray(final.positions)))
    # ligand should not blow up
    drift = np.linalg.norm(np.asarray(final.positions) - crd, axis=1).max()
    assert drift < 1.0, f"ligand exploded: max drift {drift} nm"


def test_vmapped_replicas_distinct_trajectories():
    masses = jnp.ones(4)
    k = 50.0
    step = make_langevin_step(_harmonic_force(k), masses, dt=0.002,
                              friction=2.0, temperature=250.0)

    R = 8
    keys = jax.random.split(jax.random.PRNGKey(3), R)
    x0 = jnp.zeros((R, 4, 3))
    states = jax.vmap(
        lambda key, x: initialize_state(key, x, masses, 250.0))(keys, x0)
    run = jax.jit(jax.vmap(lambda s: run_segment(step, s, 50)))
    finals = run(states)
    pos = np.asarray(finals.positions)
    # all replicas evolved and differ from each other
    assert np.all(np.ptp(pos, axis=0) > 0)


def test_redraw_hot_velocities_drains_trapped_replicas():
    """Fusion-trap drain: hot replicas get fresh Maxwell-Boltzmann
    velocities from their own key stream; cold replicas are bitwise
    untouched (velocities AND keys, so their trajectories continue
    unchanged)."""
    from openmmgridforce_tpu.parallel import (init_replica_states,
                                              redraw_hot_velocities,
                                              replica_temperatures)

    masses = jnp.asarray([12.0, 1.0, 16.0, 14.0])
    x0 = jnp.zeros((4, 3))
    R = 6
    states = init_replica_states(jax.random.PRNGKey(7), x0, masses,
                                 300.0, R)
    # blow up replicas 1 and 4 the way a capped-well orbit does
    v = np.asarray(states.velocities).copy()
    v[1] *= 40.0
    v[4] *= 40.0
    states = MDState(positions=states.positions,
                     velocities=jnp.asarray(v), key=states.key)
    t_before = np.asarray(replica_temperatures(states, masses))
    assert t_before[1] > 1000.0 and t_before[4] > 1000.0

    new, n_hot = jax.jit(lambda s: redraw_hot_velocities(
        s, masses, 300.0, 1000.0))(states)
    assert int(n_hot) == 2
    t_after = np.asarray(replica_temperatures(new, masses))
    # hot replicas re-thermalized to O(300 K) (small-N MB draw scatter)
    assert t_after[1] < 1000.0 and t_after[4] < 1000.0
    cold = [0, 2, 3, 5]
    np.testing.assert_array_equal(
        np.asarray(new.velocities)[cold], v[cold])
    np.testing.assert_array_equal(np.asarray(new.key)[cold],
                                  np.asarray(states.key)[cold])
    # hot replicas' keys advanced (fresh stream for the next draw)
    assert not np.array_equal(np.asarray(new.key)[1],
                              np.asarray(states.key)[1])
    # positions never change in a drain
    np.testing.assert_array_equal(np.asarray(new.positions),
                                  np.asarray(states.positions))
    # second call: nobody hot, everything bitwise identical
    new2, n2 = redraw_hot_velocities(new, masses, 300.0, 1000.0)
    assert int(n2) == 0
    np.testing.assert_array_equal(np.asarray(new2.velocities),
                                  np.asarray(new.velocities))
