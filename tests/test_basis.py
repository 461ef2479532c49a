"""Basis-function correctness: independent oracles, not transcription checks.

B-spline weights are compared against scipy's BSpline basis elements;
Hermite families are verified by their defining interpolation properties
(H[m,s]^(k)(side j) == delta(k,m) delta(s,j)); derivatives against
finite differences / jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import BSpline

from openmmgridforce_tpu.ops import basis


def test_bspline_matches_scipy_basis_elements():
    # Uniform cubic B-spline centered so that weight i applies to grid point
    # (ix - 1 + i): weight_i(t) = B3(t + 1 - i) with B3 the cardinal cubic
    # B-spline supported on [-2, 2].
    b3 = BSpline.basis_element(np.arange(-2, 3), extrapolate=False)
    t = np.linspace(0.0, 1.0, 41)
    ours = np.asarray(basis.bspline_weights(jnp.asarray(t)))
    for i in range(4):
        ref = np.nan_to_num(b3(t + 1 - i))
        np.testing.assert_allclose(ours[:, i], ref, atol=1e-12)


def test_bspline_partition_of_unity_and_derivs():
    t = jnp.linspace(0.0, 1.0, 17)
    w = basis.bspline_weights(t)
    np.testing.assert_allclose(np.sum(np.asarray(w), axis=-1), 1.0,
                               atol=1e-14)
    # derivative vs jax.grad of each weight
    for i in range(4):
        g = jax.vmap(jax.grad(lambda x, i=i: basis.bspline_weights(x)[i]))(t)
        np.testing.assert_allclose(np.asarray(basis.bspline_derivs(t))[:, i],
                                   np.asarray(g), atol=1e-12)


@pytest.mark.parametrize("family,orders", [
    ((basis.hermite3_weights, basis.hermite3_derivs), 2),
    ((basis.hermite5_weights, basis.hermite5_derivs), 3),
])
def test_hermite_interpolation_property(family, orders):
    """H[m, s] must satisfy d^k/dt^k H at t=side j equal delta(k,m)delta(s,j)
    for all k < orders — the defining property of the Hermite basis."""
    weights_fn, _ = family

    def value(t, m, s):
        return weights_fn(t)[m, s]

    for m in range(orders):
        for s in range(2):
            for k in range(orders):
                fn = lambda t: value(t, m, s)
                for _ in range(k):
                    fn = jax.grad(fn)
                for j, side in enumerate([0.0, 1.0]):
                    got = float(fn(jnp.asarray(side)))
                    want = 1.0 if (k == m and j == s) else 0.0
                    assert got == pytest.approx(want, abs=1e-12), (
                        f"m={m} s={s} k={k} side={j}: {got} != {want}")


@pytest.mark.parametrize("weights_fn,derivs_fn", [
    (basis.hermite3_weights, basis.hermite3_derivs),
    (basis.hermite5_weights, basis.hermite5_derivs),
])
def test_hermite_derivs_match_autodiff(weights_fn, derivs_fn):
    t = jnp.linspace(0.0, 1.0, 13)
    jac = jax.vmap(jax.jacfwd(weights_fn))(t)
    np.testing.assert_allclose(np.asarray(derivs_fn(t)), np.asarray(jac),
                               atol=1e-12)
