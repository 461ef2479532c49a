"""Shared test utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from openmmgridforce_tpu.ops.derivatives27 import DERIV_ORDERS


def derivs27_by_autodiff(f, point):
    """All 27 mixed partials (orders <= 2 per axis) of scalar f: R^3 -> R at
    ``point``, via nested forward-mode autodiff — an oracle independent of
    the framework's chain-rule/tensor machinery.

    Builds the full derivative tensors T_k = jacfwd^k f (shape 3^k) in one
    jitted pass and reads off the needed entries (mixed partials commute).
    """
    fns = [f]
    for _ in range(6):
        fns.append(jax.jacfwd(fns[-1]))

    point = jnp.asarray(point, dtype=jnp.float64)
    tensors = jax.jit(lambda p: tuple(fn(p) for fn in fns))(point)
    tensors = [np.asarray(t) for t in tensors]

    out = np.zeros(27)
    for d, (a, b, c) in enumerate(DERIV_ORDERS):
        k = a + b + c
        idx = (0,) * a + (1,) * b + (2,) * c
        out[d] = tensors[k][idx] if k > 0 else float(tensors[0])
    return out


def random_poly222(rng, scale=1.0):
    """A random polynomial with per-axis degree <= 2 and its coefficients.

    Returns (f, coeffs[3,3,3]) with f(p) = sum c[i,j,k] x^i y^j z^k.
    """
    coeffs = rng.standard_normal((3, 3, 3)) * scale

    def f(p):
        x, y, z = p[0], p[1], p[2]
        xs = jnp.stack([jnp.ones_like(x), x, x * x])
        ys = jnp.stack([jnp.ones_like(y), y, y * y])
        zs = jnp.stack([jnp.ones_like(z), z, z * z])
        return jnp.einsum("ijk,i,j,k->", jnp.asarray(coeffs), xs, ys, zs)

    return f, coeffs
