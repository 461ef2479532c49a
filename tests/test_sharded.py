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
