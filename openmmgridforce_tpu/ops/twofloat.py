"""Double-float32 ("two-float") arithmetic primitives.

A value is carried as an unevaluated pair ``(hi, lo)`` of float32 arrays
with ``hi = fl(hi + lo)`` — roughly 49 bits of significand, i.e. ~1e-14
relative, on a device whose only fast type is float32. Used by
ops/compensated.py to break the f32 evaluation floor (~2-4e-5 pose-level
on steep capped fields) that plain float32 interpolation carries, without
any float64 on-device.

Algorithms are the classical error-free transforms (Knuth 2Sum, Veltkamp
split, Dekker 2Prod) and the double-word operations of Joldes, Muller &
Popescu, "Tight and rigorous error bounds for basic building blocks of
double-word arithmetic" (ACM TOMS 2017).

FMA-contraction hazard (measured, XLA:CPU): LLVM may contract
`fl(a*b) - c` into `fma(a, b, -c)` inside a fusion (excess precision),
which evaluates the product UNROUNDED in one use — observed to corrupt
a multiplicative Veltkamp split from ~1e-14 to ~1e-7 relative when one
operand is a trace-time constant, and the contraction happens at LLVM
codegen where `lax.optimization_barrier` does not reach (measured: the
barrier changes nothing). The defense here is structural: (1) the split
is a BITMASK round-to-nearest split (integer add + mask on the bit
pattern — no float multiply to contract), so every partial product is
a product of two 12-significand-bit values and hence EXACT in float32
(an FMA of an exact product is bit-identical); and (2) 2Prod never
forms the raw `a*b` high word at all — it assembles (p, e) from the
exact partial products with add-only 2Sum chains, leaving no
rounding-significant multiply anywhere in the transform. Plain f32
additions have no excess precision on CPU/TPU and XLA does not
reassociate float sums, so 2Sum is safe as written.

These are building blocks for an ACCURACY TIER, not the MD hot path: a
double-word multiply costs ~25 VPU flops. The hot path stays plain f32
(ops/packed.py).

No reference counterpart: the reference's accuracy ladder tops out at
float64 on the CPU Reference platform
(platforms/reference/src/ReferenceGridForceKernels.cpp) and float32 on
CUDA (its tests gate at 2-5% — python/tests/test_triquintic.py:215).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

def two_sum(a, b):
    """Error-free a + b: returns (s, e) with s = fl(a+b), s + e = a + b."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def fast_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def bitmask_split(a):
    """a = hi + lo, hi = round-to-nearest-12-significand-bits(a).

    Same result as the multiplicative Veltkamp split but computed on the
    bit pattern (integer add of a half-ulp-at-12-bits, then mask), so
    there is no float multiply for the compiler to FMA-contract. The
    carry of the +0x800 propagates into the exponent field, which is
    exactly the rounding-up-to-the-next-binade case. |lo| <= 2^(e-12)
    and both halves carry <= 12 significand bits, so every pairwise
    product of halves is exact in float32.
    """
    bits = jax.lax.bitcast_convert_type(jnp.asarray(a, jnp.float32),
                                        jnp.uint32)
    hi_bits = (bits + jnp.uint32(0x800)) & jnp.uint32(0xFFFFF000)
    hi = jax.lax.bitcast_convert_type(hi_bits, jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """a * b as a pair: returns (p, e) with p + e = a*b + delta,
    |delta| <= ~2u^2*|a*b| (u = 2^-24).

    Dekker-style over bitmask-split halves, but deliberately NOT the
    textbook form `p = a*b; e = ah*bh - p + ...`: measured on XLA:CPU,
    LLVM rematerializes a raw product into consumer fusions as an FMA
    (`p + c -> fma(a, b, c)`), silently absorbing p's rounding error —
    and `lax.optimization_barrier` does NOT survive to codegen to stop
    it. Instead p is assembled from the four EXACT partial products of
    the 12-bit halves with add-only 2Sum chains: there is no
    rounding-significant multiply left for the compiler to contract
    (contracting an exact product changes nothing). Costs ~6 extra VPU
    flops and relaxes exactness from 0 to O(u^2) relative — far inside
    df_mul's own ~5u^2 bound. Overflow-safe for |a|,|b| < ~2^115.
    """
    ah, al = bitmask_split(a)
    bh, bl = bitmask_split(b)
    p1 = ah * bh      # all four partial products are exact in f32
    p2 = ah * bl
    p3 = al * bh
    p4 = al * bl
    s23, e23 = two_sum(p2, p3)
    hi, e1 = two_sum(p1, s23)
    lo = (e1 + e23) + p4
    return fast_two_sum(hi, lo)


# ----------------------------------------------------------------------
# Double-word (df) operations on (hi, lo) pairs
# ----------------------------------------------------------------------

def df(hi, lo=None):
    """Promote a float32 array to a df pair."""
    hi = jnp.asarray(hi, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, jnp.asarray(lo, jnp.float32)


def df_from_f64(x) -> tuple[np.ndarray, np.ndarray]:
    """Host-side exact split of float64 data into a df pair (numpy)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to(x):
    """Collapse a df pair to plain float32 (loses the low word)."""
    return x[0] + x[1]


def df_neg(x):
    return -x[0], -x[1]


def df_add(x, y):
    """AccurateDWPlusDW (JMP 2017 alg. 6): relative error ~3u^2."""
    s_hi, s_lo = two_sum(x[0], y[0])
    t_hi, t_lo = two_sum(x[1], y[1])
    c = s_lo + t_hi
    v_hi, v_lo = fast_two_sum(s_hi, c)
    return fast_two_sum(v_hi, t_lo + v_lo)


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_add_f(x, b):
    """df + float32 (DWPlusFP, JMP 2017 alg. 4): error <= 2u^2."""
    s_hi, s_lo = two_sum(x[0], b)
    return fast_two_sum(s_hi, s_lo + x[1])


def df_mul(x, y):
    """DWTimesDW (JMP 2017 alg. 12): relative error ~5u^2."""
    p_hi, p_lo = two_prod(x[0], y[0])
    t = x[0] * y[1] + x[1] * y[0]
    return fast_two_sum(p_hi, p_lo + t)


def df_mul_f(x, b):
    """df * float32 (DWTimesFP, JMP 2017 alg. 9): relative error ~2u^2."""
    p_hi, p_lo = two_prod(x[0], b)
    return fast_two_sum(p_hi, p_lo + x[1] * b)


def df_scale_pow2(x, c):
    """Exact multiply by a power of two (2.0, 0.5, ...)."""
    return x[0] * c, x[1] * c


def df_where(cond, x, y):
    return (jnp.where(cond, x[0], y[0]), jnp.where(cond, x[1], y[1]))


def df_sum(x):
    """Sum a df pair of 1-D arrays to a df scalar by binary-tree
    df_add: log2(N) VECTORIZED double-word adds instead of an N-step
    sequential scan (which would serialize the whole reduction on TPU).
    The tree order loses nothing: every partial stays a double-word
    value, so the result carries the same ~u^2-per-level error bound."""
    hi = jnp.asarray(x[0]).reshape(-1)
    lo = jnp.asarray(x[1]).reshape(-1)
    n = int(hi.shape[0])
    if n == 0:
        return jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)
    p = 1 << max(n - 1, 0).bit_length() if n > 1 else 1
    if p != n:
        hi = jnp.concatenate([hi, jnp.zeros(p - n, hi.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros(p - n, lo.dtype)])
    while p > 1:
        p //= 2
        hi, lo = df_add((hi[:p], lo[:p]), (hi[p:], lo[p:]))
    return hi[0], lo[0]
