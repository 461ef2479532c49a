"""Faa di Bruno composer validated against nested JAX autodiff.

The composer (openmmgridforce_tpu/ops/chain_rules.py) replaces the
reference's auto-generated TanhChainRule.cuh / InvPowerChainRule.cuh. Here
we verify it by composing smooth transforms with random degree-(2,2,2)
polynomials, whose 27 derivatives we obtain by an independent oracle
(nested jax.grad).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openmmgridforce_tpu.ops import chain_rules as cr
from tests.helpers import derivs27_by_autodiff, random_poly222


@pytest.fixture
def poly_and_derivs():
    rng = np.random.default_rng(42)
    f, _ = random_poly222(rng)
    point = jnp.asarray(rng.uniform(-1.0, 1.0, 3))
    U = derivs27_by_autodiff(f, point)
    return f, point, U


def test_tanh_cap_matches_autodiff(poly_and_derivs):
    f, point, U = poly_and_derivs
    # Shift so that u = U/cap is above the 0.1 passthrough threshold.
    cap = 2.0
    shift = 1.0 - U[0]  # U0 -> 1.0, u = 0.5
    U = U.copy()
    U[0] += shift

    got = np.asarray(cr.apply_tanh_cap(jnp.asarray(U), cap))

    want = derivs27_by_autodiff(
        lambda p: cap * jnp.tanh((f(p) + shift) / cap), point)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_tanh_cap_passthrough_below_threshold(poly_and_derivs):
    _, _, U = poly_and_derivs
    cap = 1e6  # u = U0/cap << 0.1 -> raw derivatives pass through
    got = np.asarray(cr.apply_tanh_cap(jnp.asarray(U), cap))
    np.testing.assert_array_equal(got, U)


def test_tanh_saturation_zeroes_derivatives():
    U = np.ones(27)
    U[0] = 1e9
    cap = 1.0
    got = np.asarray(cr.apply_tanh_cap(jnp.asarray(U), cap))
    assert got[0] == pytest.approx(cap)
    np.testing.assert_allclose(got[1:], 0.0, atol=1e-12)


@pytest.mark.parametrize("p", [0.5, 2.0, 1.0 / 12.0])
def test_invpower_matches_autodiff_positive_field(poly_and_derivs, p):
    f, point, U = poly_and_derivs
    shift = 3.0 - U[0]  # keep U well positive (sign conventions exact there)
    U = U.copy()
    U[0] += shift

    got = np.asarray(cr.apply_invpower(jnp.asarray(U), p))
    want = derivs27_by_autodiff(lambda q: (f(q) + shift) ** p, point)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_invpower_value_dead_zone():
    v = jnp.asarray([0.0, 1e-12, 4.0, -4.0])
    got = np.asarray(cr.invpower_value(v, 0.5))
    np.testing.assert_allclose(got, [0.0, 0.0, 2.0, -2.0], atol=1e-14)


def test_compose_identity():
    """g(U) = U must return the input unchanged."""
    rng = np.random.default_rng(7)
    U = jnp.asarray(rng.standard_normal((5, 27)))
    one = jnp.ones(5)
    zero = jnp.zeros(5)
    got = cr.compose(U[..., 0], [one, zero, zero, zero, zero, zero], U)
    np.testing.assert_allclose(np.asarray(got), np.asarray(U), atol=1e-14)
