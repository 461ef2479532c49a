"""Pallas grid-generation kernel vs the jnp path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.ops import gridgen
from openmmgridforce_tpu.ops.pallas_gridgen import generate_grid_values_pallas

RNG = np.random.default_rng(53)


@pytest.mark.parametrize("grid_type", ["charge", "ljr", "lja"])
def test_pallas_gridgen_matches_jnp(grid_type):
    counts = (9, 10, 11)
    spacing = (0.1, 0.11, 0.09)
    origin = (0.0, -0.2, 0.3)
    A = 37
    pos = RNG.uniform(-0.3, 1.2, (A, 3))
    q = RNG.uniform(-1, 1, A)
    sig = RNG.uniform(0.2, 0.35, A)
    eps = RNG.uniform(0.1, 1.0, A)

    ref = np.asarray(gridgen.generate_grid(
        counts, spacing, origin, grid_type, pos, q, sig, eps,
        grid_cap=800.0, dtype=jnp.float32).vals)
    got = np.asarray(generate_grid_values_pallas(
        counts, spacing, origin, grid_type, pos, q, sig, eps, 800.0,
        interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_pallas_gridgen_capping_saturates():
    """A point right on top of an atom must cap exactly at grid_cap."""
    counts = (3, 3, 3)
    spacing = (0.1, 0.1, 0.1)
    origin = (0.0, 0.0, 0.0)
    pos = np.array([[0.1, 0.1, 0.1]])  # exactly on node (1,1,1)
    got = np.asarray(generate_grid_values_pallas(
        counts, spacing, origin, "ljr", pos, np.array([0.0]),
        np.array([0.3]), np.array([1.0]), 500.0, interpret=True))
    assert got[1, 1, 1] == pytest.approx(500.0)
