"""Sharded-grid evaluation on a virtual 8-device mesh vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from openmmgridforce_tpu import Grid, InterpolationMethod
from openmmgridforce_tpu.ops.packed import evaluate_packed, pack_grid
from openmmgridforce_tpu.parallel.sharded_grid import (
    make_sharded_grid_eval, shard_packed_grid)

RNG = np.random.default_rng(61)
COUNTS = (21, 10, 12)  # ncx = 20, not divisible by 8 -> exercises padding
SPACING = (0.1, 0.12, 0.09)
ORIGIN = (0.0, 0.0, 0.0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


@pytest.mark.parametrize("method", [InterpolationMethod.TRILINEAR,
                                    InterpolationMethod.BSPLINE])
def test_sharded_matches_single_device(mesh, method):
    vals = RNG.standard_normal(COUNTS)
    grid = Grid.create(vals, SPACING, ORIGIN, interp_method=method,
                       oob_k=333.0, dtype=np.float64)
    packed = pack_grid(grid)
    sharded = shard_packed_grid(packed, mesh)
    eval_fn = jax.jit(make_sharded_grid_eval(mesh))

    lo = np.asarray(ORIGIN) - 0.1
    hi = (np.asarray(ORIGIN)
          + (np.asarray(COUNTS) - 1) * np.asarray(SPACING) + 0.1)
    pos = RNG.uniform(lo, hi, size=(64, 3))  # includes out-of-bounds
    scaling = RNG.standard_normal(64)
    scaling[5] = 0.0

    want = evaluate_packed(packed, pos, scaling)
    got = eval_fn(sharded, jnp.asarray(pos), jnp.asarray(scaling))

    np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                               np.asarray(want.per_atom_energy),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.forces),
                               np.asarray(want.forces),
                               rtol=1e-12, atol=1e-12)
    assert float(got.energy) == pytest.approx(float(want.energy),
                                              rel=1e-12)


def test_sharded_memory_is_distributed(mesh):
    """Each device holds only its slab of the coefficient rows."""
    vals = RNG.standard_normal(COUNTS).astype(np.float32)
    grid = Grid.create(vals, SPACING, ORIGIN,
                       interp_method=InterpolationMethod.BSPLINE)
    packed = pack_grid(grid)
    sharded = shard_packed_grid(packed, mesh)
    shards = sharded.coeffs.addressable_shards
    assert len(shards) == 8
    total = sharded.coeffs.shape[0]
    for s in shards:
        assert s.data.shape[0] == total // 8


def test_sharded_md_runner_matches_single_device():
    """Full dp x sp MD segment == single-device make_md_runner, same keys."""
    from openmmgridforce_tpu.mm import make_md_runner
    from openmmgridforce_tpu.mm.integrators import MDState
    from openmmgridforce_tpu.mm.system import GridBinding, System
    from openmmgridforce_tpu.ops.packed import (combine_packed_grids,
                                                pack_grid)
    from openmmgridforce_tpu.ops.pairwise import build_pair_table
    from openmmgridforce_tpu.parallel.sharded_grid import (
        make_sharded_md_runner, shard_packed_grid)
    from jax.sharding import NamedSharding

    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))

    rng = np.random.default_rng(8)
    counts = (13, 9, 9)
    vals = rng.standard_normal(counts)
    grid = Grid.create(vals, (0.1, 0.1, 0.1), (0.0, 0.0, 0.0),
                       interp_method=InterpolationMethod.BSPLINE,
                       dtype=np.float64)
    packed = pack_grid(grid)
    multi = combine_packed_grids([packed])
    sharded = shard_packed_grid(multi, mesh2, axis="sp")

    n_atoms, R = 6, 8
    charges = rng.uniform(-0.3, 0.3, n_atoms)
    system = System(
        masses=jnp.full((n_atoms,), 12.0),
        charges=jnp.asarray(charges),
        sigmas=jnp.full((n_atoms,), 0.25),
        epsilons=jnp.full((n_atoms,), 0.4),
        bond_idx=jnp.asarray([[i, i + 1] for i in range(n_atoms - 1)],
                             jnp.int32),
        bond_k=jnp.full((n_atoms - 1,), 5e4),
        bond_r0=jnp.full((n_atoms - 1,), 0.15),
        angle_idx=jnp.zeros((0, 3), jnp.int32),
        angle_k=jnp.zeros(0), angle_t0=jnp.zeros(0),
        torsion_idx=jnp.zeros((0, 4), jnp.int32),
        torsion_k=jnp.zeros(0), torsion_per=jnp.zeros(0),
        torsion_phase=jnp.zeros(0),
        pairs=build_pair_table(charges, np.full(n_atoms, 0.25),
                               np.full(n_atoms, 0.4),
                               exclusions=[(i, i + 1)
                                           for i in range(n_atoms - 1)]),
    )
    scaling = jnp.asarray(charges)[None, :]  # [G=1, N]

    x0 = jnp.asarray(0.45 + 0.12 * np.arange(n_atoms)[:, None]
                     * np.array([[1.0, 0.2, 0.1]])
                     + rng.uniform(-0.01, 0.01, (n_atoms, 3)))
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(R))
    states = MDState(jnp.broadcast_to(x0, (R, n_atoms, 3)),
                     jnp.zeros((R, n_atoms, 3)), keys)
    temps = jnp.full((R,), 300.0)

    # single-device reference
    run_ref = make_md_runner(20, dt=0.0005, friction=2.0)
    ref = run_ref(states, system, [GridBinding(grid=multi,
                                               scaling=scaling)], temps)

    # sharded
    run_sh = make_sharded_md_runner(mesh2, 20, dt=0.0005, friction=2.0)
    dp_spec = NamedSharding(mesh2, P("dp"))
    states_sh = jax.tree.map(lambda x: jax.device_put(x, dp_spec), states)
    with mesh2:
        got = run_sh(states_sh, system, sharded, scaling, temps)

    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(ref.positions), rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.velocities),
                               np.asarray(ref.velocities), rtol=1e-10,
                               atol=1e-12)


def test_sharded_generation_matches_single_device():
    """x-slab generation over the mesh must equal single-device
    generate_grid exactly (values and all 27 derivatives)."""
    from jax.sharding import Mesh
    from openmmgridforce_tpu.ops import gridgen
    from openmmgridforce_tpu.parallel import generate_grid_sharded

    rng = np.random.default_rng(5)
    rec = rng.uniform(0.0, 1.2, (20, 3))
    q = rng.uniform(-0.5, 0.5, 20)
    sig = rng.uniform(0.25, 0.35, 20)
    eps = rng.uniform(0.3, 0.8, 20)
    counts = (13, 6, 5)          # x deliberately NOT divisible by 8
    spacing = (0.1, 0.1, 0.1)
    origin = (0.05, 0.05, 0.05)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))

    for derivs in (False, True):
        ref = gridgen.generate_grid(counts, spacing, origin, "charge",
                                    rec, q, sig, eps,
                                    compute_derivatives=derivs,
                                    dtype=np.float64)
        shd = generate_grid_sharded(mesh, counts, spacing, origin,
                                    "charge", rec, q, sig, eps,
                                    compute_derivatives=derivs,
                                    dtype=np.float64)
        assert len(shd.vals.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(shd.vals),
                                   np.asarray(ref.vals), rtol=1e-12)
        if derivs:
            np.testing.assert_allclose(np.asarray(shd.derivs),
                                       np.asarray(ref.derivs),
                                       rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("method", [InterpolationMethod.TRICUBIC,
                                    InterpolationMethod.TRIQUINTIC])
def test_sharded_hermite_packed_matches_single_device(mesh, method):
    """Hermite-packed (bounded-basis) rows shard over sp exactly like the
    monomial rows: slab-local gather + one psum, bit-exact vs the
    unsharded evaluator, fused multi-grid included."""
    from openmmgridforce_tpu.ops.gridgen import generate_grid
    from openmmgridforce_tpu.ops.packed import (combine_hermite_packed,
                                                evaluate_hermite_multi,
                                                pack_grid_hermite)

    rec = RNG.uniform(0.1, 1.5, (10, 3))
    q = np.abs(RNG.uniform(-0.4, 0.4, 10))
    gs = [generate_grid(COUNTS, SPACING, ORIGIN, t, rec, q,
                        np.full(10, 0.3), np.full(10, 0.5),
                        compute_derivatives=True, interp_method=method,
                        oob_k=333.0, dtype=np.float64)
          for t in ("charge", "lja")]
    multi = combine_hermite_packed([pack_grid_hermite(g) for g in gs])
    sharded = shard_packed_grid(multi, mesh)
    assert sharded.form == "hermite"
    eval_fn = jax.jit(make_sharded_grid_eval(mesh))

    lo = np.asarray(ORIGIN) - 0.1
    hi = (np.asarray(ORIGIN)
          + (np.asarray(COUNTS) - 1) * np.asarray(SPACING) + 0.1)
    pos = RNG.uniform(lo, hi, size=(64, 3))
    scaling = RNG.standard_normal((2, 64))
    scaling[0, 5] = 0.0

    want = evaluate_hermite_multi(multi, pos, scaling)
    got = eval_fn(sharded, jnp.asarray(pos), jnp.asarray(scaling))
    np.testing.assert_allclose(np.asarray(got.per_atom_energy),
                               np.asarray(want.per_atom_energy),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.forces),
                               np.asarray(want.forces),
                               rtol=1e-12, atol=1e-12)
