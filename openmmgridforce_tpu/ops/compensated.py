"""Compensated (double-float32) packed-grid evaluation: the accuracy tier
that breaks the plain-f32 evaluation floor without any on-device float64.

Plain float32 evaluation of the canonical receptor grids carries a
~2-4e-5 pose-level relative-error floor near receptor cores (measured in
BENCH_CANONICAL.jsonl accuracy rows; the dominant terms are the cell
fraction computed from O(100)-cell coordinates at f32 ulp and the K-term
contraction rounding). This module removes both:

  * per-cell Chebyshev coefficients are packed in float64 on the host and
    stored as an (hi, lo) float32 pair — ~49-bit effective significand —
    fused into ONE row table so evaluation still costs a single coalesced
    row gather per atom (the TPU gather is priced per instruction);
  * the cell fraction, the Chebyshev basis recurrences, and every
    contraction run in double-word float32 arithmetic (ops/twofloat.py).

The result is limited only by the float32 storage of the grid data itself
and the final per-atom rounding (~6e-8 relative), comfortably under the
1e-5 north-star gate — at roughly an order of magnitude more VPU flops
than the plain tier. Use it for accuracy-gated evaluations (pose scoring,
parity gates); MD production stays on ops/packed.py.

Semantics (clamping, OOB restraint, inverse-power back-transform, active
masking) mirror ops/packed.evaluate_packed exactly; the reference
counterpart of those semantics is
platforms/reference/src/ReferenceGridForceKernels.cpp:646-1121.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid, InterpolationMethod
from .interpolate import GridEval
from .packed import pack_grid
from .twofloat import (df, df_add, df_add_f, df_from_f64, df_mul, df_mul_f,
                       df_scale_pow2, df_sub, df_sum, df_to, df_where,
                       fast_two_sum, two_sum)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompensatedPackedGrid:
    """Per-cell Chebyshev coefficients as fused (hi | lo) float32 rows.

    ``coeffs`` is [ncells, pad(2K)]: columns [0, K) hold the high words,
    [K, 2K) the low words of the float64-packed coefficients — one row
    gather serves both. Geometry is carried as df pairs so the cell
    fraction can be formed to ~1e-14 relative.
    """

    coeffs: jax.Array                  # [ncells, pad(2K)] f32
    origin_hi: jax.Array               # [3] f32
    origin_lo: jax.Array               # [3] f32
    inv_spacing_hi: jax.Array          # [3] f32
    inv_spacing_lo: jax.Array          # [3] f32
    corner_hi: jax.Array               # [3] f32 (spacing*(counts-1))
    corner_lo: jax.Array               # [3] f32
    spacing: jax.Array                 # [3] f32
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    degree: int = dataclasses.field(default=2, metadata=dict(static=True))
    back_power: float = dataclasses.field(default=0.0,
                                          metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


def pack_grid_compensated(grid: Grid, x_chunk: int | None = None,
                          lane_pad: int = 128, origin=None,
                          spacing=None) -> CompensatedPackedGrid:
    """Pack a Grid into compensated (hi|lo) Chebyshev rows.

    Packing runs in float64 Chebyshev on the host CPU backend (exact to
    ~2^-52 of each coefficient), then splits each coefficient into an
    f32 pair. Works for all four interpolation methods; Hermite methods
    need grid.derivs as usual.

    ``origin``/``spacing``: exact float64 geometry overrides. A float32
    Grid carries geometry already ROUNDED to f32, and that rounding is
    the dominant compensated-tier error on large grids: the cell
    coordinate shifts by ~1e-7 * t cells, which multiplies by the
    per-cell field slope (measured on the canonical 13.4M-pt grids at
    t ~ 43: 3.5e-3 kJ/mol = 1.1e-6 of field scale — 20x the design
    floor; with exact geometry the tier returns to ~5e-8). Pass the
    f64 values whenever the caller still has them.
    """
    if jax.config.jax_enable_x64:
        p64 = pack_grid(grid, dtype=np.float64, x_chunk=x_chunk,
                        poly_basis="chebyshev")
        coeffs64 = np.asarray(p64.coeffs)
    else:
        # f64 is unavailable in this process's default backend: scope
        # x64 to the host CPU (same pattern as pack_grid's value-method
        # Chebyshev branch)
        with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
            p64 = pack_grid(grid, dtype=np.float64, x_chunk=x_chunk,
                            poly_basis="chebyshev")
            coeffs64 = np.asarray(p64.coeffs)
    hi, lo = df_from_f64(coeffs64)
    del coeffs64
    ncells, K = hi.shape
    padded = -(-2 * K // lane_pad) * lane_pad
    rows = np.zeros((ncells, padded), np.float32)
    rows[:, :K] = hi
    rows[:, K:2 * K] = lo
    sp = np.asarray(grid.spacing if spacing is None else spacing,
                    np.float64)
    o_hi, o_lo = df_from_f64(np.asarray(
        grid.origin if origin is None else origin, np.float64))
    isp_hi, isp_lo = df_from_f64(1.0 / sp)
    # the f64 reference's inside test compares (pos - origin) against
    # fl64(spacing*(counts-1)); carry that exact corner as a df pair
    c_hi, c_lo = df_from_f64(sp * (np.asarray(grid.counts) - 1))
    return CompensatedPackedGrid(
        coeffs=jnp.asarray(rows),
        origin_hi=jnp.asarray(o_hi), origin_lo=jnp.asarray(o_lo),
        inv_spacing_hi=jnp.asarray(isp_hi),
        inv_spacing_lo=jnp.asarray(isp_lo),
        corner_hi=jnp.asarray(c_hi), corner_lo=jnp.asarray(c_lo),
        spacing=jnp.asarray(sp, jnp.float32),
        counts=grid.counts,
        degree=p64.degree,
        back_power=p64.back_power,
        oob_k=p64.oob_k,
    )


# ----------------------------------------------------------------------
# df Chebyshev basis
# ----------------------------------------------------------------------

def _cheb_df(f, d):
    """T_p(2f-1) and d/df T_p(2f-1) for p < d, in df arithmetic.

    f is a df pair of [...]-shaped arrays. Returns (T, dT): lists of d
    df pairs each. d/df T_p(2f-1) = 2p U_{p-1}(2f-1).
    """
    one = df(jnp.ones_like(f[0]))
    zero = df(jnp.zeros_like(f[0]))
    u = df_add_f(df_scale_pow2(f, 2.0), jnp.float32(-1.0))
    T = [one, u]
    for _ in range(2, d):
        T.append(df_sub(df_scale_pow2(df_mul(u, T[-1]), 2.0), T[-2]))
    U = [one, df_scale_pow2(u, 2.0)]
    for _ in range(2, max(d - 1, 2)):
        U.append(df_sub(df_scale_pow2(df_mul(u, U[-1]), 2.0), U[-2]))
    dT = [zero]
    for p in range(1, d):
        dT.append(df_mul_f(U[p - 1], jnp.float32(2.0 * p)))
    return T[:d], dT[:d]


def _df_contract_last(R_hi, R_lo, w, d):
    """Contract the trailing axis of an (hi, lo) coefficient tensor with
    a list of d df weights (each broadcastable to the result shape).

    Returns an (hi, lo) pair with the trailing axis reduced.
    """
    # broadcast each w[r] ([N]) across the remaining tensor axes
    extra = R_hi.ndim - 1 - w[0][0].ndim
    def bcast(x):
        for _ in range(extra):
            x = (x[0][..., None], x[1][..., None])
        return x

    acc = df_mul((R_hi[..., 0], R_lo[..., 0]), bcast(w[0]))
    for r in range(1, d):
        acc = df_add(acc, df_mul((R_hi[..., r], R_lo[..., r]),
                                 bcast(w[r])))
    return acc


@partial(jax.jit, static_argnames=("counts", "degree", "back_power",
                                   "oob_k", "K"))
def _evaluate_compensated_core(coeffs, origin_hi, origin_lo,
                               inv_spacing_hi, inv_spacing_lo,
                               corner_hi, corner_lo, spacing,
                               pos_hi, pos_lo, scaling,
                               counts, degree, back_power, oob_k, K):
    d = degree
    # --- df cell coordinates ---------------------------------------
    # r = pos - origin, exactly; t = r * (1/spacing) in df
    t_ax, f_ax, ix_ax = [], [], []
    inside = None
    icounts = jnp.asarray(counts)
    for ax in range(3):
        r = df_sub((pos_hi[..., ax], pos_lo[..., ax]),
                   (origin_hi[ax], origin_lo[ax]))
        t = df_mul(r, (inv_spacing_hi[ax], inv_spacing_lo[ax]))
        ix = jnp.clip(jnp.floor(t[0]).astype(jnp.int32), 0,
                      icounts[ax] - 2)
        # f = t - ix: exact two_sum against the (exactly representable)
        # cell index, then clamp to [0, 1] (hi outside -> zero the low)
        fh, e = two_sum(t[0], -ix.astype(jnp.float32))
        f = fast_two_sum(fh, e + t[1])
        out = (f[0] < 0.0) | (f[0] > 1.0)
        f = (jnp.clip(f[0], 0.0, 1.0),
             jnp.where(out, 0.0, f[1]))
        # inside test matching the f64 reference's comparison of
        # (pos - origin) vs fl64(spacing*(counts-1)). The df difference
        # carries O(u^2) ~ 1e-14 relative rounding, so an atom exactly
        # ON a face lands at +/-noise around zero; bias by a tolerance
        # of 2e-13*corner toward "inside" (the reference's <=). The
        # resulting misclassification window is ~5e-13 nm around each
        # face — far below any physical or f32-trajectory resolution.
        over = df_sub(r, (corner_hi[ax], corner_lo[ax]))
        tol = jnp.float32(2e-13) * corner_hi[ax]
        in_ax = ((r[0] + r[1] >= -tol)
                 & (over[0] + over[1] <= tol))
        inside = in_ax if inside is None else (inside & in_ax)
        t_ax.append(t)
        f_ax.append(f)
        ix_ax.append(ix)

    # OOB deviation in plain f32 (for a genuinely-outside atom the
    # restraint energy is well-conditioned; marginal atoms get ~0 either
    # way by continuity)
    pos_f32 = pos_hi + pos_lo
    pos_rel = pos_f32 - (origin_hi + origin_lo)
    countsf = jnp.asarray(counts, jnp.float32)
    corner = spacing * (countsf - 1.0)

    ncx, ncy, ncz = counts[0] - 1, counts[1] - 1, counts[2] - 1
    cell = (ix_ax[0] * ncy + ix_ax[1]) * ncz + ix_ax[2]
    rows = jnp.take(coeffs, cell, axis=0)              # [N, pad(2K)]
    R_hi = rows[..., :K].reshape(rows.shape[:-1] + (d, d, d))
    R_lo = rows[..., K:2 * K].reshape(rows.shape[:-1] + (d, d, d))

    Tx, dTx = _cheb_df(f_ax[0], d)
    Ty, dTy = _cheb_df(f_ax[1], d)
    Tz, dTz = _cheb_df(f_ax[2], d)

    # --- separable df contraction, sharing partials ------------------
    A = _df_contract_last(R_hi, R_lo, Tz, d)       # [N, d, d]
    Adz = _df_contract_last(R_hi, R_lo, dTz, d)    # [N, d, d]
    By = _df_contract_last(A[0], A[1], Ty, d)      # [N, d]
    Bdy = _df_contract_last(A[0], A[1], dTy, d)    # [N, d]
    Bdz = _df_contract_last(Adz[0], Adz[1], Ty, d)  # [N, d]
    interp = _df_contract_last(By[0], By[1], Tx, d)     # [N]
    gx = _df_contract_last(By[0], By[1], dTx, d)
    gy = _df_contract_last(Bdy[0], Bdy[1], Tx, d)
    gz = _df_contract_last(Bdz[0], Bdz[1], Tx, d)

    if back_power != 0.0:
        n = jnp.float32(back_power)
        sign = jnp.where(interp[0] >= 0.0, 1.0, -1.0).astype(jnp.float32)
        a = (jnp.abs(interp[0]), interp[1] * sign)
        active_bp = a[0] > 1e-10
        a_hi = jnp.where(active_bp, a[0], 1.0)
        a_lo = jnp.where(active_bp, a[1], 0.0)
        # (a_hi + a_lo)^n = a_hi^n * (1 + n*a_lo/a_hi) to first order;
        # the neglected term is O((a_lo/a_hi)^2) ~ 1e-15 relative
        p_main = a_hi ** n
        p_corr = p_main * (n * (a_lo / a_hi))
        val = fast_two_sum(p_main, p_corr)
        val = (val[0] * sign, val[1] * sign)
        pf = n * a_hi ** (n - 1.0)                 # f32 prefactor is
        interp = df_where(active_bp, val, interp)  # ample for forces
        gx = df_where(active_bp, df_mul_f(gx, pf), gx)
        gy = df_where(active_bp, df_mul_f(gy, pf), gy)
        gz = df_where(active_bp, df_mul_f(gz, pf), gz)

    grads = []
    for ax, g in enumerate((gx, gy, gz)):
        grads.append(df_mul(g, (inv_spacing_hi[ax], inv_spacing_lo[ax])))

    energy_in = df_mul_f(interp, scaling)
    force_in = jnp.stack([-scaling * df_to(g) for g in grads], axis=-1)

    dev = jnp.where(pos_rel < 0.0, pos_rel,
                    jnp.where(pos_rel > corner, pos_rel - corner, 0.0))
    energy_oob = 0.5 * oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -oob_k * dev

    active = inside & (scaling != 0.0)
    per_atom = df_where(active, energy_in, df(energy_oob))
    forces = jnp.where(active[..., None], force_in, force_oob)

    # total energy: df tree reduction over every atom (and batch entry)
    # — log2(N) vectorized double-word adds (a sequential per-atom scan
    # would serialize the reduction on TPU) — collapsed to f32 only at
    # the very end
    tot = df_sum(per_atom)
    return df_to(tot), forces, df_to(per_atom)


def evaluate_compensated(cp: CompensatedPackedGrid, positions,
                         scaling_factors) -> GridEval:
    """Energy/forces via the compensated representation.

    ``positions`` may be float64 (split exactly into a df pair) or
    float32 (low words zero — still removes fraction and contraction
    rounding). Semantics match ops.packed.evaluate_packed.
    """
    positions = jnp.asarray(positions)
    if positions.dtype == jnp.float64:
        pos_hi = positions.astype(jnp.float32)
        pos_lo = (positions - pos_hi.astype(jnp.float64)) \
            .astype(jnp.float32)
    else:
        pos_hi = positions.astype(jnp.float32)
        pos_lo = jnp.zeros_like(pos_hi)
    scaling = jnp.asarray(scaling_factors, jnp.float32)
    K = cp.degree ** 3

    def run():
        return _evaluate_compensated_core(
            cp.coeffs, cp.origin_hi, cp.origin_lo, cp.inv_spacing_hi,
            cp.inv_spacing_lo, cp.corner_hi, cp.corner_lo, cp.spacing,
            pos_hi, pos_lo, scaling,
            counts=cp.counts, degree=cp.degree,
            back_power=cp.back_power, oob_k=cp.oob_k, K=K)

    # XLA:CPU pathology (measured 2026-08, jax 0.5-era thunk runtime):
    # the jitted core at degree >= 6 compiles in ~10 s but the RUN of
    # even 8 points spins for hours at 100% CPU — the fused elementwise
    # codegen re-evaluates the deep double-float expression DAG
    # (4 nested contraction levels x 6-term two_sum chains)
    # exponentially. Op-by-op dispatch of the same graph takes ~0.4 s
    # per 256 points, so on the CPU backend we drop the jit wrapper for
    # quintic-and-up degrees. TPU (the production target) keeps the
    # jitted path. Override with OMGF_COMPENSATED_JIT=1.
    import os
    eager = (cp.degree >= 6
             and not os.environ.get("OMGF_COMPENSATED_JIT")
             and not isinstance(positions, jax.core.Tracer)
             and all(d.platform == "cpu" for d in cp.coeffs.devices()))
    if eager:
        with jax.disable_jit():
            energy, forces, per_atom = run()
    else:
        energy, forces, per_atom = run()
    return GridEval(energy, forces, per_atom)
