"""Exact chain rules for composed scalar transforms of 27-derivative fields.

Computes all 27 mixed partial derivatives (orders <= 2 per axis) of
V = g(U(x, y, z)) from the 27 derivatives of U via the multivariate
Faa di Bruno formula:

    d^lambda (g o U) = sum over set partitions pi of the variable multiset
                       g^(|pi|)(U) * prod_{B in pi} d^B U

The partition tables are generated programmatically at import time and the
composition is evaluated as a small fused elementwise expression — this is
the generic TPU-native replacement for the reference's two auto-generated
device headers (platforms/cuda/src/kernels/include/TanhChainRule.cuh and
InvPowerChainRule.cuh), validated against nested JAX autodiff in
tests/test_chain_rules.py.

Two concrete transforms are provided, matching the reference semantics:
  * tanh cap      V = U_max * tanh(U / U_max)   (TanhChainRule.cuh:44-415)
  * inverse power V = sign(U) * |U|^p           (InvPowerChainRule.cuh:12-174)
"""

from __future__ import annotations

import functools
from collections import Counter

import jax.numpy as jnp

from .derivatives27 import DERIV_ORDERS, ORDER_TO_INDEX, N_DERIVS

MAX_ORDER = 6  # highest total derivative order (2+2+2)


# ----------------------------------------------------------------------
# Partition-table generation
# ----------------------------------------------------------------------

def _set_partitions(items):
    """Yield all set partitions of a list (standard recursive scheme)."""
    if len(items) == 1:
        yield [items]
        return
    first, rest = items[0], items[1:]
    for smaller in _set_partitions(rest):
        for i, block in enumerate(smaller):
            yield smaller[:i] + [[first] + block] + smaller[i + 1:]
        yield [[first]] + smaller


def _orders_of_block(block):
    """Multiset of axis labels -> (a, b, c) order triple."""
    c = Counter(block_item[0] for block_item in block)
    return (c.get("x", 0), c.get("y", 0), c.get("z", 0))


@functools.lru_cache(maxsize=1)
def faa_di_bruno_tables():
    """For each of the 27 target derivative slots, the collapsed partition
    expansion: a list of (num_blocks, coefficient, tuple(U-slot indices)).

    Slot 0 (the value) is excluded; V = g(U) directly.
    """
    tables = {}
    for d, (a, b, c) in enumerate(DERIV_ORDERS):
        if d == 0:
            continue
        # distinct labelled variable instances, e.g. (2,1,0) -> x0,x1,y0
        variables = ([("x", i) for i in range(a)]
                     + [("y", i) for i in range(b)]
                     + [("z", i) for i in range(c)])
        counter: Counter = Counter()
        for partition in _set_partitions(variables):
            signature = tuple(sorted(
                ORDER_TO_INDEX[_orders_of_block(block)]
                for block in partition))
            counter[signature] += 1
        tables[d] = [
            (len(sig), coeff, sig) for sig, coeff in sorted(counter.items())
        ]
    return tables


def compose(g_value, g_derivs, U):
    """Apply Faa di Bruno: V = g(U) with all 27 mixed derivatives.

    Args:
      g_value: g(U[..., 0]) — the transformed value, shape [...].
      g_derivs: [g1, ..., g6] — g^(k) evaluated at U[..., 0], each [...].
      U: [..., 27] input derivatives in the canonical order.

    Returns:
      V: [..., 27].
    """
    tables = faa_di_bruno_tables()
    out = [g_value]
    for d in range(1, N_DERIVS):
        acc = None
        for num_blocks, coeff, slots in tables[d]:
            term = g_derivs[num_blocks - 1]
            for s in slots:
                term = term * U[..., s]
            if coeff != 1:
                term = coeff * term
            acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.stack(out, axis=-1)


# ----------------------------------------------------------------------
# tanh capping: V = U_max * tanh(U / U_max)
# ----------------------------------------------------------------------

def safe_tanh(x):
    """tanh with explicit saturation beyond |x| > 20.

    The TPU backend's tanh returns NaN for large finite arguments; tanh(20)
    differs from 1 by ~4e-18, far below f64 roundoff of any capped value, and
    the reference saturates at the same threshold (TanhChainRule.cuh:16-24).
    """
    xc = jnp.clip(x, -20.0, 20.0)
    t = jnp.tanh(xc)
    return jnp.where(x > 20.0, 1.0, jnp.where(x < -20.0, -1.0, t))


def tanh_derivatives(u):
    """T[k] = d^k tanh(u)/du^k for k = 0..6, with saturation |u| > 20
    (reference TanhChainRule.cuh:15-39). Returns list of 7 arrays."""
    sat_hi = u > 20.0
    sat_lo = u < -20.0
    sat = sat_hi | sat_lo
    u_safe = jnp.clip(u, -20.0, 20.0)
    t = jnp.tanh(u_safe)
    t2 = t * t
    t4 = t2 * t2
    s2 = 1.0 - t2
    T0 = jnp.where(sat_hi, 1.0, jnp.where(sat_lo, -1.0, t))
    zero = jnp.zeros_like(t)
    Ts = [
        s2,
        -2.0 * s2 * t,
        2.0 * s2 * (3.0 * t2 - 1.0),
        -8.0 * s2 * t * (3.0 * t2 - 2.0),
        8.0 * s2 * (15.0 * t4 - 15.0 * t2 + 2.0),
        -16.0 * s2 * t * (45.0 * t4 - 60.0 * t2 + 17.0),
    ]
    return [T0] + [jnp.where(sat, zero, Tk) for Tk in Ts]


def apply_tanh_cap(U, cap, low_energy_passthrough=True):
    """Cap all 27 derivatives: V = cap * tanh(U / cap).

    ``low_energy_passthrough`` reproduces the reference's early exit
    (TanhChainRule.cuh:76-79): when U/cap < 0.1 the raw derivatives are
    returned unchanged (note this means values below 0.1*cap — including all
    negative values — are never capped on the analytic-derivative path,
    unlike the value-only path which always applies tanh).

    Args:
      U: [..., 27]; cap: scalar U_max.
    Returns [..., 27].
    """
    u = U[..., 0] / cap
    T = tanh_derivatives(u)
    inv = 1.0 / cap
    g_value = cap * T[0]
    # g^(k)(U) = T[k] / cap^(k-1)
    g_derivs = [T[k] * inv ** (k - 1) for k in range(1, 7)]
    V = compose(g_value, g_derivs, U)
    if low_energy_passthrough:
        V = jnp.where((u < 0.1)[..., None], U, V)
    return V


def tanh_cap_value(value, cap):
    """Value-only capping V = cap * tanh(value / cap)
    (reference gridGeneration.cu:342)."""
    return cap * safe_tanh(value / cap)


# ----------------------------------------------------------------------
# inverse power: V = sign(U) * |U|^p
# ----------------------------------------------------------------------

def invpower_g_derivatives(U0, p):
    """g(U) = sign(U) * |U|^p with |U| clamped to >= 1e-10, and its
    derivative factors g^(k) = p*(p-1)*...*(p-k+1) * |U|^(p-k).

    Note: matching the reference (InvPowerChainRule.cuh:65-...), the sign of
    U is applied to the value only; the derivative factors use |U| powers
    without sign factors (exact for U > 0, which is the intended regime —
    LJ-repulsion-style grids).
    """
    sign = jnp.where(U0 >= 0.0, 1.0, -1.0)
    absU = jnp.maximum(jnp.abs(U0), 1e-10)
    g_value = sign * absU ** p
    g_derivs = []
    fall = 1.0
    for k in range(1, 7):
        fall = fall * (p - (k - 1))
        g_derivs.append(fall * absU ** (p - k))
    return g_value, g_derivs


def apply_invpower(U, p):
    """Transform all 27 derivatives for V = sign(U)|U|^p. U: [..., 27]."""
    g_value, g_derivs = invpower_g_derivatives(U[..., 0], p)
    return compose(g_value, g_derivs, U)


def invpower_value(value, p):
    """Value-only transform sign(v)|v|^p with the evaluation-kernel's
    1e-10 dead zone (reference gridForce.cu:127-134): values with
    |v| < 1e-10 map to 0."""
    av = jnp.abs(value)
    av_safe = jnp.where(av >= 1e-10, av, 1.0)
    return jnp.where(av >= 1e-10, jnp.sign(value) * av_safe ** p, 0.0)
