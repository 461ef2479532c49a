"""BAT coordinates and the replica-exchange / genetic-MC sampler."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.mm import load_inpcrd, load_prmtop, system_from_amber
from openmmgridforce_tpu.sampling import (Sampler, SamplerConfig,
                                          bat_to_xyz, build_zmatrix,
                                          temperature_ladder, xyz_to_bat)

DATA = "/root/reference/python/prmtopcrd"
HAVE_FIXTURES = os.path.exists(f"{DATA}/ligand.prmtop")
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ligand():
    top = load_prmtop(f"{DATA}/ligand.prmtop")
    crd = load_inpcrd(f"{DATA}/ligand.trans.inpcrd")
    return top, crd


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_bat_roundtrip_ligand(ligand):
    """xyz -> BAT -> xyz must reproduce coordinates exactly (the z-matrix
    is a bijection up to numerics)."""
    top, crd = ligand
    z, primary = build_zmatrix(top.masses, [tuple(b) for b in top.bond_idx])
    assert z.shape == (top.natom - 3, 4)
    b = xyz_to_bat(crd, z, primary)
    assert b.shape == (3 * top.natom,)
    back = bat_to_xyz(b, z, primary)
    np.testing.assert_allclose(back, crd, atol=1e-9)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_bat_torsion_edit_preserves_geometry(ligand):
    """Editing one torsion must keep all bond lengths/angles intact."""
    top, crd = ligand
    z, primary = build_zmatrix(top.masses, [tuple(b) for b in top.bond_idx])
    b = xyz_to_bat(crd, z, primary)
    n = len(z)
    b2 = b.copy()
    b2[9 + 2 * n + n // 2] += 1.0  # rotate one torsion by 1 rad
    xyz2 = bat_to_xyz(b2, z, primary)
    b3 = xyz_to_bat(xyz2, z, primary)
    np.testing.assert_allclose(b3[9:9 + 2 * n], b[9:9 + 2 * n], atol=1e-8)
    # and the round-trip reproduces the edited torsions
    d = ((b3[9 + 2 * n:] - b2[9 + 2 * n:] + np.pi) % (2 * np.pi)) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-8)


def test_temperature_ladder():
    t = temperature_ladder(300.0, 600.0, 21)
    assert t[0] == pytest.approx(300.0)
    assert t[-1] == pytest.approx(600.0)
    ratios = t[1:] / t[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-12)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_sampler_end_to_end(ligand):
    """Short production loop: MD + exchanges + genetic MC stay finite and
    moves are bookkept."""
    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=4, t_high=400.0, t_min=300.0,
                           dt=0.001, friction=5.0, md_steps_per_trial=20)
    sampler = Sampler(system, [], jnp.asarray(crd), config,
                      bonds=[tuple(b) for b in top.bond_idx])

    sampler.run(n_trials=3, n_exchange_per_trial=2, n_gmc_per_trial=1)

    e = sampler.potential_energies()
    assert e.shape == (4,)
    assert np.all(np.isfinite(e))
    assert sampler.n_exchange_attempted == 6
    assert sampler.n_gmc_attempted == 6
    pos = np.asarray(sampler.states.positions)
    assert np.all(np.isfinite(pos))
    # replicas decorrelate
    assert np.ptp(pos, axis=0).max() > 1e-4


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_sampler_drain_trapped(ligand):
    """drain_trapped re-thermalizes only the rungs hotter than 5x their
    ladder temperature, at their own ladder temperature."""
    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=4, t_high=400.0, t_min=300.0)
    sampler = Sampler(system, [], jnp.asarray(crd), config,
                      bonds=[tuple(b) for b in top.bond_idx])

    assert sampler.drain_trapped() == 0  # starts cold (zero velocities)

    from openmmgridforce_tpu.parallel import replica_temperatures
    v = np.asarray(sampler.states.velocities).copy()
    v[2] = 10.0  # one rung fusion-orbits (10 nm/ps everywhere ~ 10^5 K)
    cold = [0, 1, 3]
    sampler.states = sampler.states._replace(velocities=jnp.asarray(v))
    assert sampler.drain_trapped() == 1
    t = np.asarray(replica_temperatures(sampler.states, system.masses))
    # re-drawn near its OWN ladder temperature (small-N draw scatter)
    assert t[2] < 5.0 * sampler.temperatures[2]
    np.testing.assert_array_equal(
        np.asarray(sampler.states.velocities)[cold], v[cold])


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_exchange_detailed_balance_acceptance(ligand):
    """With all replicas at identical positions, every exchange must be
    accepted (log_ratio == 0)."""
    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=3, t_high=500.0, t_min=300.0)
    sampler = Sampler(system, [], jnp.asarray(crd), config)
    for _ in range(5):
        assert sampler.replica_exchange() == 1


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_exchange_sweep_all_accept_identical(ligand):
    """Identical replicas -> every sweep attempt accepts (log_ratio = 0)."""
    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=5, t_high=500.0, t_min=300.0)
    sampler = Sampler(system, [], jnp.asarray(crd), config)
    n = sampler.replica_exchange_sweep(10)
    assert n == 10
    assert sampler.n_exchange_attempted == 10


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_sampler_sharded_matches_single_device(ligand):
    """A mesh-sharded ladder (replicas data-parallel over 'dp') must
    reproduce the single-device sampler: per-replica MD is independent and
    the exchange permutation is deterministic given the seed."""
    from jax.sharding import Mesh

    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=8, t_high=500.0, t_min=300.0,
                           dt=0.001, friction=5.0, md_steps_per_trial=10)

    ref = Sampler(system, [], jnp.asarray(crd), config,
                  bonds=[tuple(b) for b in top.bond_idx])
    ref.run(n_trials=2, n_exchange_per_trial=3, n_gmc_per_trial=1)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    shd = Sampler(system, [], jnp.asarray(crd), config,
                  bonds=[tuple(b) for b in top.bond_idx], mesh=mesh)
    # states actually span the mesh
    assert len(shd.states.positions.sharding.device_set) == 8
    shd.run(n_trials=2, n_exchange_per_trial=3, n_gmc_per_trial=1)

    np.testing.assert_allclose(np.asarray(shd.states.positions),
                               np.asarray(ref.states.positions),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(shd.potential_energies(),
                               ref.potential_energies(), rtol=1e-12)
    assert shd.n_exchange_accepted == ref.n_exchange_accepted
    assert shd.n_gmc_accepted == ref.n_gmc_accepted


def test_sampler_mesh_divisibility_error():
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    config = SamplerConfig(n_states=21)
    with pytest.raises(ValueError, match="divisible"):
        # constructor must reject a non-divisible ladder before any work
        Sampler(None, [], jnp.zeros((3, 3)), config, mesh=mesh)


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_sampler_dp_sp_matches_single_device(ligand):
    """Full dp x sp sampler (replicas data-parallel, fused grid table
    sharded spatially) must reproduce the single-device ladder: the
    zero-halo slab evaluation is bit-equivalent by construction."""
    from jax.sharding import Mesh
    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import GridBinding
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)

    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    lo = crd.min(0) - 0.4
    packs, scals = [], []
    for seed, scale in ((3, np.abs(RNG.standard_normal(top.natom))),
                        (4, RNG.standard_normal(top.natom))):
        vals = np.random.default_rng(seed).standard_normal(
            (17, 12, 12)) * 2.0
        g = Grid.create(vals, (0.12, 0.12, 0.12), lo,
                        interp_method=InterpolationMethod.BSPLINE,
                        dtype=np.float64)
        packs.append(pack_grid(g))
        scals.append(scale)
    binding = GridBinding(grid=combine_packed_grids(packs),
                          scaling=jnp.asarray(np.stack(scals)))

    config = SamplerConfig(n_states=4, t_high=500.0, t_min=300.0,
                           dt=0.001, friction=5.0, md_steps_per_trial=10)
    ref = Sampler(system, [binding], jnp.asarray(crd), config,
                  bonds=[tuple(b) for b in top.bond_idx])
    ref.run(n_trials=2, n_exchange_per_trial=3, n_gmc_per_trial=1)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))
    shd = Sampler(system, [binding], jnp.asarray(crd), config,
                  bonds=[tuple(b) for b in top.bond_idx], mesh=mesh)
    assert shd._sp
    assert len(shd._sgrid.coeffs.sharding.device_set) == 8
    shd.run(n_trials=2, n_exchange_per_trial=3, n_gmc_per_trial=1)

    np.testing.assert_allclose(np.asarray(shd.states.positions),
                               np.asarray(ref.states.positions),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(shd.potential_energies(),
                               ref.potential_energies(), rtol=1e-10)
    assert shd.n_exchange_accepted == ref.n_exchange_accepted
    assert shd.n_gmc_accepted == ref.n_gmc_accepted


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_sampler_dp_sp_constrained_matches_single_device(ligand):
    """SHAKE/RATTLE constraints are replica-local, so the dp x sp path
    must reproduce the constrained single-device ladder too."""
    from jax.sharding import Mesh
    from openmmgridforce_tpu import Grid, InterpolationMethod
    from openmmgridforce_tpu.mm import GridBinding
    from openmmgridforce_tpu.ops.packed import pack_grid

    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0,
                               constraints="HBonds")
    g = Grid.create(
        np.random.default_rng(9).standard_normal((17, 12, 12)) * 2.0,
        (0.12,) * 3, crd.min(0) - 0.4,
        interp_method=InterpolationMethod.BSPLINE, dtype=np.float64)
    binding = GridBinding(grid=pack_grid(g),
                          scaling=jnp.asarray(np.ones(top.natom)))
    config = SamplerConfig(n_states=4, t_high=500.0, t_min=300.0,
                           dt=0.001, friction=5.0, md_steps_per_trial=10)

    ref = Sampler(system, [binding], jnp.asarray(crd), config)
    ref.run(n_trials=2, n_exchange_per_trial=2)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))
    shd = Sampler(system, [binding], jnp.asarray(crd), config, mesh=mesh)
    assert shd._sp
    shd.run(n_trials=2, n_exchange_per_trial=2)

    np.testing.assert_allclose(np.asarray(shd.states.positions),
                               np.asarray(ref.states.positions),
                               rtol=0, atol=1e-12)
    assert shd.n_exchange_accepted == ref.n_exchange_accepted


@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
@pytest.mark.skipif(not HAVE_FIXTURES, reason="fixtures not available")
def test_bat_jax_matches_numpy(ligand):
    """The jnp BAT converters (device path for genetic-MC proposal
    batches) must match the NumPy reference implementation to f64
    round-off, on the real ligand and on perturbed conformations."""
    from openmmgridforce_tpu.sampling.bat import make_jax_converters
    top, crd = ligand
    z, primary = build_zmatrix(top.masses, [tuple(b) for b in top.bond_idx])
    x2b, b2x = make_jax_converters(z, primary)

    confs = [crd]
    b0 = xyz_to_bat(crd, z, primary)
    n = len(z)
    for s in range(3):   # torsion-perturbed conformations
        b = b0.copy()
        b[9 + 2 * n:] += RNG.uniform(-1.5, 1.5, n)
        confs.append(bat_to_xyz(b, z, primary))

    for xyz in confs:
        want_b = xyz_to_bat(xyz, z, primary)
        got_b = np.asarray(x2b(jnp.asarray(xyz, jnp.float64)))
        # torsions compare modulo 2*pi
        np.testing.assert_allclose(got_b[:9 + 2 * n],
                                   want_b[:9 + 2 * n], atol=1e-12)
        d = ((got_b[9 + 2 * n:] - want_b[9 + 2 * n:] + np.pi)
             % (2 * np.pi)) - np.pi
        np.testing.assert_allclose(d, 0.0, atol=1e-12)
        back = np.asarray(b2x(jnp.asarray(want_b, jnp.float64)))
        np.testing.assert_allclose(back, bat_to_xyz(want_b, z, primary),
                                   atol=1e-12)
        np.testing.assert_allclose(back, xyz, atol=1e-8)

    # vmapped batch = stacked singles
    batch = jnp.asarray(np.stack(confs), jnp.float64)
    bats = np.asarray(jax.vmap(x2b)(batch))
    for i, xyz in enumerate(confs):
        np.testing.assert_allclose(bats[i],
                                   np.asarray(x2b(batch[i])), atol=0)


def test_genetic_sweep_batched_bookkeeping(ligand):
    """genetic_sweep batches candidate energies into one dispatch; its
    acceptance bookkeeping must be self-consistent: every accepted
    replica's stored energy equals a fresh recomputation, rejected
    replicas are untouched, and counters add up."""
    top, crd = ligand
    system = system_from_amber(top, hydrogen_mass=4.0)
    config = SamplerConfig(n_states=6, t_high=2000.0, t_min=300.0,
                           dt=0.001, friction=5.0, seed=3)
    sampler = Sampler(system, [], jnp.asarray(crd), config,
                      bonds=[tuple(b) for b in top.bond_idx])
    # decorrelate replicas first so moves are non-trivial
    sampler.run_md(50)
    pos_before = np.array(sampler.states.positions)
    e_before = sampler.potential_energies()

    n_acc = sampler.genetic_sweep(4)   # 8 moves in <=2 batched dispatches
    assert sampler.n_gmc_attempted == 8
    assert sampler.n_gmc_accepted == n_acc

    pos_after = np.array(sampler.states.positions)
    e_after = sampler.potential_energies()
    changed = [r for r in range(6)
               if not np.allclose(pos_after[r], pos_before[r])]
    assert len(changed) <= n_acc
    for r in range(6):
        if r not in changed:
            np.testing.assert_array_equal(pos_after[r], pos_before[r])
            np.testing.assert_allclose(e_after[r], e_before[r], rtol=1e-9)
    assert np.all(np.isfinite(e_after))
    # geometry integrity: bonds survived the BAT surgery
    from openmmgridforce_tpu.sampling import build_zmatrix, xyz_to_bat
    z, primary = build_zmatrix(top.masses, [tuple(b) for b in top.bond_idx])
    for r in changed:
        b_old = xyz_to_bat(pos_before[r], z, primary)
        b_new = xyz_to_bat(pos_after[r], z, primary)
        n = len(z)
        # bond lengths (first of each z-row triple) stay identical: only
        # torsions are spliced between replicas
        np.testing.assert_allclose(b_new[9:9 + n], b_old[9:9 + n],
                                   atol=1e-7)
