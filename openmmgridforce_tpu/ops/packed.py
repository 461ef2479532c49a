"""Packed per-cell polynomial grids: the TPU fast path for interpolation.

Every interpolation method this engine supports (trilinear, cubic B-spline,
tricubic Hermite, triquintic Hermite) evaluates, inside any given cell, a
fixed tensor-product polynomial of the cell fraction: P(s) = sum
c_pqr sx^p sy^q sz^r. The stencil -> polynomial map does not depend on the
atom position, so the coefficients can be precomputed ONCE per cell.

Evaluation then needs exactly ONE coalesced row gather (K contiguous floats)
plus ~4K fused multiply-adds per atom — instead of 8-64 scattered scalar
gathers. On TPU, where XLA gathers cost per *instruction* rather than per
byte, this is the difference between ~20 ms and ~0.1 ms per force
evaluation at 47k atoms (measured on v5e). It is also exactly the dataflow
the MXU/VPU want: dense rows in, FMA out, no branches.

This replaces the reference's in-kernel 64x64 / 216x216 coefficient
matrix products per atom (gridForce.cu:204-294) with a one-time
whole-grid separable contraction, and subsumes its RUNTIME inverse-power
stencil transforms (folded into packing; the post-interpolation
back-transform keeps runtime semantics identical).

Semantics match ops/interpolate.py exactly (same clamping, OOB restraint,
inv-power back-transform); parity is enforced in tests/test_packed.py.

Precision note (triquintic): monomial coefficients of steep capped fields
reach ~1e8-1e10 while cell values stay ~1e4, so float32 evaluation of the
coefficient form carries ~1 kJ/mol absolute error near receptor cores —
the SAME conditioning class as the reference CUDA kernel's per-atom
a = 0.125*M*X in float32 (gridForce.cu:285-294; its tests gate at 2-5%).
For tighter accuracy use the HERMITE-PACKED form below
(pack_grid_hermite/evaluate_hermite_packed: the SAME single row gather
per atom, but corner-derivative rows evaluated in the bounded Hermite
basis — measured 5.7e-7 relative in f32 on a steep capped LJR field
where the monomial pack carries 5.8e-6), the direct tensor-product
Hermite path (ops.interpolate.evaluate_grid), or pack in float64.
Degree <= 3 methods (trilinear, B-spline, tricubic) are
well-conditioned in either form.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid, InterpolationMethod, InvPowerMode
from . import basis
from .chain_rules import apply_invpower, invpower_value
from .interpolate import GridEval


# ----------------------------------------------------------------------
# Basis -> monomial coefficient matrices (computed numerically from the
# basis functions themselves; exact for these low degrees in float64)
# ----------------------------------------------------------------------

def _poly_coeffs_from_fn(fn, n_outputs_shape, degree):
    """Fit exact monomial coefficients of polynomial basis functions by
    solving a Vandermonde system at degree+1 nodes. Sampled under
    enable_x64 so the (lru_cached) matrices are float64-exact even in an
    f32 process — these matrices seed every pack contraction."""
    t = np.linspace(0.0, 1.0, degree + 1)
    V = np.vander(t, degree + 1, increasing=True)  # [nodes, powers]
    with jax.enable_x64():
        vals = np.asarray(jax.vmap(fn)(jnp.asarray(t, jnp.float64)))
    flat = vals.reshape(degree + 1, -1)
    coeffs = np.linalg.solve(V, flat)              # [powers, nbasis]
    return coeffs.reshape((degree + 1,) + n_outputs_shape)


@lru_cache(maxsize=None)
def _value_axis_matrix(method: int) -> np.ndarray:
    """C[p, a]: monomial coefficients of the per-axis stencil weight for
    offset a (value-based methods)."""
    if method == InterpolationMethod.TRILINEAR:
        return np.array([[1.0, 0.0], [-1.0, 1.0]])  # 1-t, t
    if method == InterpolationMethod.BSPLINE:
        return _poly_coeffs_from_fn(basis.bspline_weights, (4,), 3)
    raise ValueError(method)


@lru_cache(maxsize=None)
def _hermite_axis_matrix(method: int) -> np.ndarray:
    """H[p, m, s]: monomial coefficients of the Hermite basis H_{m,s}."""
    if method == InterpolationMethod.TRICUBIC:
        return _poly_coeffs_from_fn(basis.hermite3_weights, (2, 2), 3)
    if method == InterpolationMethod.TRIQUINTIC:
        return _poly_coeffs_from_fn(basis.hermite5_weights, (3, 2), 5)
    raise ValueError(method)


@lru_cache(maxsize=None)
def _hermite_axis_matrix_cheb(method: int) -> np.ndarray:
    """Hc[p, m, s]: CHEBYSHEV coefficients (in T_p(2v-1)) of the Hermite
    basis H_{m,s} — the monomial axis matrix composed with the
    monomial->Chebyshev change of basis, in float64 on the host. Packing
    with Hc produces Chebyshev cell coefficients DIRECTLY: the huge,
    cancellation-prone monomial coefficients (1e8-1e10 on steep capped
    triquintic fields) are never materialized, each axis contraction
    yields bounded Chebyshev coefficients of a partial interpolant, and
    the whole pack runs on-device in the grid's own dtype. (The previous
    design packed in f64 THEN converted — which forced the contraction
    onto the host CPU on f32 TPU processes, round-tripping every region's
    derivative data through the tunnel.)"""
    H = _hermite_axis_matrix(method)             # [d, m, s] monomial
    d = H.shape[0]
    B = _monomial_to_cheb(d)                     # [p, j]
    return np.einsum("pj,jms->pms", B, H)


@lru_cache(maxsize=None)
def _monomial_to_cheb(d: int) -> np.ndarray:
    """B[p, j]: coefficients turning monomial coeffs a_j (in v on [0,1])
    into Chebyshev coeffs b_p of the SAME polynomial in T_p(2v-1).

    Why: the triquintic monomial coefficients of steep capped fields reach
    1e8-1e10 (huge cancellation in f32), while Chebyshev coefficients are
    bounded by ~max|P| on the cell — converting the basis AT PACK TIME (in
    f64) makes float32 evaluation well-conditioned at identical runtime
    cost (same [d,d,d] einsum, basis vector via a 2-term recurrence).
    """
    # C2M[p, j] = coefficient of v^j in T_p(2v-1)
    C2M = np.zeros((d, d))
    for pp in range(d):
        c = np.zeros(pp + 1)
        c[pp] = 1.0
        poly = np.polynomial.chebyshev.cheb2poly(c)      # in u
        # substitute u = 2v - 1
        pv = np.polynomial.polynomial.Polynomial([-1.0, 2.0])
        out = np.polynomial.polynomial.Polynomial([0.0])
        for j, cj in enumerate(poly):
            out = out + cj * pv ** j
        C2M[pp, :len(out.coef)] = out.coef
    return np.linalg.inv(C2M).T                           # B[p, j]


def _poly_powers(v, d: int, basis: str):
    """[..., d] basis values at cell fraction v: v^p or T_p(2v-1)."""
    if basis == "monomial":
        return jnp.stack([v ** p for p in range(d)], axis=-1)
    u = 2.0 * v - 1.0
    T = [jnp.ones_like(v), u]
    for _ in range(2, d):
        T.append(2.0 * u * T[-1] - T[-2])
    return jnp.stack(T[:d], axis=-1)


def _poly_dpowers(v, d: int, basis: str):
    """[..., d] d/dv of the basis values."""
    if basis == "monomial":
        return jnp.stack([jnp.zeros_like(v)] + [p * v ** (p - 1)
                                                for p in range(1, d)],
                         axis=-1)
    # d/dv T_p(2v-1) = 2 p U_{p-1}(2v-1)
    u = 2.0 * v - 1.0
    U = [jnp.ones_like(v), 2.0 * u]
    for _ in range(2, d - 1):
        U.append(2.0 * u * U[-1] - U[-2])
    cols = [jnp.zeros_like(v)]
    for pp in range(1, d):
        cols.append(2.0 * pp * U[pp - 1])
    return jnp.stack(cols, axis=-1)


def _coeffs_to_cheb(coeffs, d: int):
    """[ncells, d^3] monomial -> Chebyshev tensor coefficients (f64)."""
    B = jnp.asarray(_monomial_to_cheb(d), dtype=coeffs.dtype)
    R = coeffs.reshape(-1, d, d, d)
    R = jnp.einsum("pi,qj,rk,cijk->cpqr", B, B, B, R)
    return R.reshape(-1, d ** 3)


# Map the canonical 27-slot order to [mx, my, mz] tensor layout.
from .derivatives27 import DERIV_ORDERS  # noqa: E402

_D27_TO_M3 = np.zeros((3, 3, 3), dtype=np.int64)
for _i, (_a, _b, _c) in enumerate(DERIV_ORDERS):
    _D27_TO_M3[_a, _b, _c] = _i


# ----------------------------------------------------------------------
# Packed grid pytree
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedGrid:
    """Per-cell monomial coefficients plus evaluation config."""

    coeffs: jax.Array            # [ncells, K], K = degree^3
    spacing: jax.Array           # [3]
    origin: jax.Array            # [3]
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    degree: int = dataclasses.field(default=2, metadata=dict(static=True))
    # inverse-power back-transform exponent (0 = disabled); RUNTIME stencil
    # transforms are folded into the coefficients at pack time
    back_power: float = dataclasses.field(default=0.0,
                                          metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))
    poly_basis: str = dataclasses.field(default="monomial",
                                        metadata=dict(static=True))

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


from functools import partial


@partial(jax.jit, static_argnames=("method", "runtime_inv", "inv_power",
                                   "counts"))
def _pack_values(vals, method, runtime_inv, inv_power, counts):
    nx, ny, nz = counts
    ncx, ncy, ncz = nx - 1, ny - 1, nz - 1
    C = jnp.asarray(_value_axis_matrix(method), dtype=vals.dtype)
    P = vals
    if runtime_inv:
        # fold the stencil transform (gridForce.cu:127-134) into packing
        P = invpower_value(P, 1.0 / inv_power)
    if method == InterpolationMethod.BSPLINE:
        # stencil offsets -1..+2 with index clamping == edge padding
        P = jnp.pad(P, ((1, 2), (1, 2), (1, 2)), mode="edge")

    def contract(x, axis, ncells_axis):
        A = C.shape[1]
        S = jnp.stack([jax.lax.slice_in_dim(x, a, a + ncells_axis,
                                            axis=axis)
                       for a in range(A)], axis=0)
        return jnp.einsum("pa,a...->p...", C, S)

    T = contract(P, 0, ncx)          # [px, i, y, z]
    T = contract(T, 2, ncy)          # [py, px, i, j, z]
    T = contract(T, 4, ncz)          # [pz, py, px, i, j, k]
    coeffs = jnp.transpose(T, (3, 4, 5, 2, 1, 0))  # [i,j,k,px,py,pz]
    K = C.shape[0] ** 3
    return coeffs.reshape(ncx * ncy * ncz, K)


@partial(jax.jit, static_argnames=("method", "runtime_inv", "inv_power",
                                   "ncells"))
def _pack_values_padded(P, method, runtime_inv, inv_power, ncells):
    """Like _pack_values but for a pre-padded slab (chunked packing):
    B-spline slabs arrive already edge/neighbor-padded; trilinear slabs
    arrive as raw point planes (no padding needed)."""
    ncx, ncy, ncz = ncells
    C = jnp.asarray(_value_axis_matrix(method), dtype=P.dtype)
    if runtime_inv:
        P = invpower_value(P, 1.0 / inv_power)

    def contract(x, axis, ncells_axis):
        A = C.shape[1]
        S = jnp.stack([jax.lax.slice_in_dim(x, a, a + ncells_axis,
                                            axis=axis)
                       for a in range(A)], axis=0)
        return jnp.einsum("pa,a...->p...", C, S)

    T = contract(P, 0, ncx)
    T = contract(T, 2, ncy)
    T = contract(T, 4, ncz)
    coeffs = jnp.transpose(T, (3, 4, 5, 2, 1, 0))
    K = C.shape[0] ** 3
    return coeffs.reshape(ncx * ncy * ncz, K)


@partial(jax.jit, static_argnames=("method", "runtime_inv", "inv_power",
                                   "counts", "out_basis"))
def _pack_derivs(derivs, method, runtime_inv, inv_power, counts,
                 out_basis="monomial"):
    nx, ny, nz = counts
    ncx, ncy, ncz = nx - 1, ny - 1, nz - 1
    H = jnp.asarray(_hermite_axis_matrix(method)
                    if out_basis == "monomial"
                    else _hermite_axis_matrix_cheb(method),
                    dtype=derivs.dtype)
    m = H.shape[1]  # 2 (tricubic) or 3 (triquintic)
    D27 = derivs
    if runtime_inv:
        D27 = apply_invpower(D27, 1.0 / inv_power)
    # reindex [.., 27] -> [.., mx, my, mz], restricted to orders < m
    sel = _D27_TO_M3[:m, :m, :m].reshape(-1)
    D = D27[..., sel].reshape(nx, ny, nz, m, m, m)

    Sx = jnp.stack([D[0:ncx], D[1:ncx + 1]], axis=0)
    T = jnp.einsum("pms,sijkmno->pijkno", H, Sx)
    Sy = jnp.stack([T[:, :, 0:ncy], T[:, :, 1:ncy + 1]], axis=0)
    T = jnp.einsum("qns,spijkno->qpijko", H, Sy)
    Sz = jnp.stack([T[:, :, :, :, 0:ncz], T[:, :, :, :, 1:ncz + 1]], axis=0)
    T = jnp.einsum("ros,sqpijko->rqpijk", H, Sz)
    coeffs = jnp.transpose(T, (3, 4, 5, 2, 1, 0))  # [i,j,k,px,py,pz]
    K = H.shape[0] ** 3
    return coeffs.reshape(ncx * ncy * ncz, K)


@partial(jax.jit, donate_argnums=0)
def _write_rows(out, part, row, col):
    """In-place (donated) write of a row-block at (row, col)."""
    return jax.lax.dynamic_update_slice(out, part, (row, col))


def pack_grid(grid: Grid, dtype=None, x_chunk: int | None = None,
              poly_basis: str | None = None) -> PackedGrid:
    """Precompute per-cell polynomial coefficients for a Grid.

    The whole-grid contraction runs as a single jitted program (one
    compile, arrays as arguments — never baked into the HLO as constants,
    which matters on backends with remote compilation).

    ``x_chunk``: pack in x-slabs of this many cells to bound device
    memory for large grids (each slab carries its one-plane stencil
    overlap). Defaults to whole-grid packing below ~2M cells and
    64-cell slabs above.

    ``poly_basis``: "monomial" or "chebyshev" — same runtime cost
    (bench-verified on v5e: 1153.7 vs 1157.5 tricubic steps/s), but
    Chebyshev coefficients stay O(max|P|) where triquintic monomial
    coefficients reach 1e8-1e10, so float32 evaluation remains ~1e-7
    accurate on steep capped fields. Hermite-method Chebyshev packs
    contract with fused basis->Chebyshev axis matrices ON DEVICE in the
    grid's dtype (monomial coefficients are never materialized, so no
    f64 detour — and no host round-trip on tunneled backends); the
    non-default value-method Chebyshev still converts from monomial in
    f64 on the host. Default (None): "chebyshev" for float32
    Hermite-method packs (tricubic / triquintic, where monomial f32
    loses ~1 kJ/mol near receptor cores), "monomial" otherwise.
    """
    dtype = dtype or grid.vals.dtype
    if poly_basis is None:
        hermite = grid.interp_method in (InterpolationMethod.TRICUBIC,
                                         InterpolationMethod.TRIQUINTIC)
        poly_basis = ("chebyshev"
                      if hermite and jnp.dtype(dtype) == jnp.float32
                      else "monomial")
    if poly_basis not in ("monomial", "chebyshev"):
        raise ValueError(f"unknown poly_basis {poly_basis!r}")
    method = grid.interp_method
    _hermite_method = method in (InterpolationMethod.TRICUBIC,
                                 InterpolationMethod.TRIQUINTIC)
    # Hermite Chebyshev packs contract with the FUSED basis->Chebyshev
    # axis matrices: on-device, in the grid's own dtype — intermediates
    # are bounded Chebyshev coefficients, so no f64 detour is needed.
    # Value-method Chebyshev (non-default) still converts from monomial
    # in f64.
    pack_dtype = (jnp.float64
                  if poly_basis == "chebyshev" and not _hermite_method
                  else dtype)
    nx, ny, nz = grid.counts
    ncx, ncy, ncz = nx - 1, ny - 1, nz - 1

    if x_chunk is None and ncx * ncy * ncz > 2_000_000:
        x_chunk = 64

    back_power = 0.0
    if grid.inv_power_mode in (InvPowerMode.RUNTIME, InvPowerMode.STORED) \
            and grid.inv_power != 0.0:
        back_power = grid.inv_power
    runtime_inv = (grid.inv_power_mode == InvPowerMode.RUNTIME
                   and grid.inv_power != 0.0)

    value_based = method in (InterpolationMethod.TRILINEAR,
                             InterpolationMethod.BSPLINE)
    if value_based:
        _value_axis_matrix(int(method))  # warm cache outside any trace
        degree = 2 if method == InterpolationMethod.TRILINEAR else 4
    else:
        if grid.derivs is None:
            raise ValueError("Hermite methods need precomputed derivatives")
        _hermite_axis_matrix(int(method))    # warm caches outside traces
        _hermite_axis_matrix_cheb(int(method))
        degree = 4 if method == InterpolationMethod.TRICUBIC else 6

    def pack_slab(data, c0, c1):
        """Pack cells [c0, c1) along x from a slice carrying its stencil
        overlap; the slice spans grid points [c0, c1 + 1) (values add the
        B-spline pad separately inside _pack_values via edge-pad of the
        SLICE — so interior slabs must bring real neighbor planes)."""
        n_slab = c1 - c0
        if value_based:
            if method == InterpolationMethod.BSPLINE:
                # planes needed: [c0-1, c1+2], clamped = edge padding
                lo = max(c0 - 1, 0)
                hi = min(c1 + 3, nx)
                sl = jnp.asarray(data[lo:hi], dtype=pack_dtype)
                pad_lo = lo - (c0 - 1)
                pad_hi = (c1 + 3) - hi
                sl = jnp.pad(sl, ((pad_lo, pad_hi), (1, 2), (1, 2)),
                             mode="edge")
                return _pack_values_padded(
                    sl, method=int(method), runtime_inv=runtime_inv,
                    inv_power=grid.inv_power,
                    ncells=(n_slab, ncy, ncz))
            sl = jnp.asarray(data[c0:c1 + 1], dtype=pack_dtype)
            return _pack_values_padded(
                sl, method=int(method), runtime_inv=runtime_inv,
                inv_power=grid.inv_power, ncells=(n_slab, ncy, ncz))
        sl = jnp.asarray(data[c0:c1 + 1], dtype=pack_dtype)
        return _pack_derivs(sl, method=int(method),
                            runtime_inv=runtime_inv,
                            inv_power=grid.inv_power,
                            counts=(n_slab + 1, ny, nz),
                            out_basis=poly_basis)

    def postprocess(coeffs):
        if poly_basis == "chebyshev" and value_based:
            coeffs = _coeffs_to_cheb(coeffs, degree)
        return coeffs.astype(dtype)

    def compute():
        data = grid.vals if value_based else grid.derivs
        if x_chunk is None or x_chunk >= ncx:
            if value_based:
                out = _pack_values(jnp.asarray(data, dtype=pack_dtype),
                                   method=int(method),
                                   runtime_inv=runtime_inv,
                                   inv_power=grid.inv_power,
                                   counts=grid.counts)
            else:
                out = _pack_derivs(jnp.asarray(data, dtype=pack_dtype),
                                   method=int(method),
                                   runtime_inv=runtime_inv,
                                   inv_power=grid.inv_power,
                                   counts=grid.counts,
                                   out_basis=poly_basis)
            return postprocess(out)
        # slabs STAY ON DEVICE (downloading packed slabs through a
        # tunneled backend costs minutes per GB) and are written into a
        # preallocated table with donated dynamic_update_slice: the
        # transient peak is the final pack plus ONE slab (a device-side
        # concatenate would briefly need 2x, and the TPU compiler
        # crashes outright on multi-GB concatenates)
        K = degree ** 3
        out = jnp.zeros((ncx * ncy * ncz, K), dtype)
        row = 0
        for c0 in range(0, ncx, x_chunk):
            c1 = min(c0 + x_chunk, ncx)
            part = postprocess(pack_slab(data, c0, c1))
            out = _write_rows(out, part, row, 0)
            row += part.shape[0]
        return out

    if (poly_basis == "chebyshev" and not _hermite_method
            and not jax.config.jax_enable_x64):
        # value-method Chebyshev goes through monomial coefficients, so
        # its conversion needs f64; scope x64 to this block and run it
        # on the host CPU backend (TPU backends have no native f64)
        with jax.enable_x64(), \
                jax.default_device(jax.devices("cpu")[0]):
            coeffs = np.asarray(compute())
        coeffs = jnp.asarray(coeffs)
    else:
        coeffs = compute()

    return PackedGrid(
        coeffs=coeffs,
        spacing=jnp.asarray(grid.spacing, dtype=dtype),
        origin=jnp.asarray(grid.origin, dtype=dtype),
        counts=grid.counts,
        degree=degree,
        back_power=back_power,
        oob_k=grid.oob_k,
        poly_basis=poly_basis,
    )


# ----------------------------------------------------------------------
# Evaluation
# ----------------------------------------------------------------------

def evaluate_packed(packed: PackedGrid, positions,
                    scaling_factors) -> GridEval:
    """Energy/forces via the packed representation.

    Numerically equivalent to ops.interpolate.evaluate_grid (same clamping,
    restraint and back-transform semantics), with one row gather per atom.
    """
    dtype = packed.coeffs.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)

    pos = positions - packed.origin
    counts = jnp.asarray(packed.counts, dtype=dtype)
    corner = packed.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    icounts = jnp.asarray(packed.counts)
    t = pos / packed.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, icounts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)

    ncx, ncy, ncz = packed.cell_counts
    cell = (ixyz[..., 0] * ncy + ixyz[..., 1]) * ncz + ixyz[..., 2]
    rows = jnp.take(packed.coeffs, cell, axis=0)      # [N, K]

    d = packed.degree
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    pb = packed.poly_basis
    px, py, pz = (_poly_powers(fx, d, pb), _poly_powers(fy, d, pb),
                  _poly_powers(fz, d, pb))
    dpx, dpy, dpz = (_poly_dpowers(fx, d, pb), _poly_dpowers(fy, d, pb),
                     _poly_dpowers(fz, d, pb))

    R = rows.reshape(rows.shape[:-1] + (d, d, d))
    interp = jnp.einsum("...pqr,...p,...q,...r->...", R, px, py, pz)
    gx = jnp.einsum("...pqr,...p,...q,...r->...", R, dpx, py, pz)
    gy = jnp.einsum("...pqr,...p,...q,...r->...", R, px, dpy, pz)
    gz = jnp.einsum("...pqr,...p,...q,...r->...", R, px, py, dpz)
    grad_s = jnp.stack([gx, gy, gz], axis=-1)

    if packed.back_power != 0.0:
        n = packed.back_power
        sign = jnp.where(interp >= 0.0, 1.0, -1.0)
        a = jnp.abs(interp)
        active = a > 1e-10
        a_safe = jnp.where(active, a, 1.0)
        pf = n * a_safe ** (n - 1.0)
        interp = jnp.where(active, sign * a_safe ** n, interp)
        grad_s = jnp.where(active[..., None], grad_s * pf[..., None],
                           grad_s)

    grad_phys = grad_s / packed.spacing
    energy_in = scaling * interp
    force_in = -scaling[..., None] * grad_phys

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    energy_oob = 0.5 * packed.oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -packed.oob_k * dev

    active = inside & (scaling != 0.0)
    per_atom = jnp.where(active, energy_in, energy_oob)
    forces = jnp.where(active[..., None], force_in, force_oob)
    return GridEval(jnp.sum(per_atom), forces, per_atom)


# ----------------------------------------------------------------------
# Multi-grid fusion: co-located grids share one gather
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiPackedGrid:
    """G packed grids with identical geometry fused into one coefficient
    table, stored as [ncells, pad(G*K)].

    The BPMF workload evaluates charge/ljr/lja grids at the SAME atom
    positions every step; fusing them means one row gather per atom instead
    of G (the gather instruction count — not bytes — is the cost on TPU).
    Rows are zero-padded to a multiple of 128 floats so gathered rows are
    whole lane tiles (measured ~1.5x faster than a 192-float minor dim).
    """

    coeffs: jax.Array            # [ncells, K_padded]
    spacing: jax.Array
    origin: jax.Array
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    degree: int = dataclasses.field(default=2, metadata=dict(static=True))
    n_grids: int = dataclasses.field(default=1, metadata=dict(static=True))
    back_powers: tuple = dataclasses.field(default=(),
                                           metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))
    poly_basis: str = dataclasses.field(default="monomial",
                                        metadata=dict(static=True))

    @property
    def num_grids(self) -> int:
        return self.n_grids

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


@partial(jax.jit, static_argnames=("padded",))
def _fuse_lanes(coeffs, padded):
    """Write per-grid coefficient tables into one preallocated
    lane-padded table with dynamic_update_slice (a lane-axis concatenate
    of multi-GB tables crashes the TPU compiler — see
    combine_packed_grids). Module-level so shape-identical fusions (e.g.
    one per streamed region) reuse ONE compiled program instead of
    tracing a fresh closure per call."""
    out = jnp.zeros((coeffs[0].shape[0], padded), coeffs[0].dtype)
    off = 0
    for c in coeffs:
        out = jax.lax.dynamic_update_slice(out, c, (0, off))
        off += c.shape[-1]
    return out


def combine_packed_grids(packed_grids, lane_pad: int = 128
                         ) -> MultiPackedGrid:
    """Fuse PackedGrids with identical geometry/degree into one table."""
    first = packed_grids[0]
    for p in packed_grids[1:]:
        if (p.counts != first.counts or p.degree != first.degree
                or p.oob_k != first.oob_k
                or p.poly_basis != first.poly_basis):
            raise ValueError("grids must share counts/degree/oob_k/basis "
                             "to fuse")
        if not (np.allclose(np.asarray(p.spacing),
                            np.asarray(first.spacing))
                and np.allclose(np.asarray(p.origin),
                                np.asarray(first.origin))):
            raise ValueError("grids must be co-located (same spacing and "
                             "origin) to fuse — evaluation would use the "
                             "first grid's geometry for all")
    G = len(packed_grids)
    K = first.coeffs.shape[-1]
    width = G * K
    padded = -(-width // lane_pad) * lane_pad

    # write each pack into a preallocated padded table with
    # dynamic_update_slice: a lane-axis concatenate of multi-GB tables
    # crashes the TPU compiler at canonical grid sizes (observed:
    # 2 x [13.2M, 64] f32 -> HTTP 500 tpu_compile_helper exit 1), while
    # the same-size DUS program compiles and runs in under a second
    flat = _fuse_lanes(tuple(p.coeffs for p in packed_grids), padded)
    return MultiPackedGrid(
        coeffs=flat,
        spacing=first.spacing,
        origin=first.origin,
        counts=first.counts,
        degree=first.degree,
        n_grids=G,
        back_powers=tuple(p.back_power for p in packed_grids),
        oob_k=first.oob_k,
        poly_basis=first.poly_basis,
    )


def pack_grids_fused(grids, dtype=None, x_chunk: int | None = None,
                     lane_pad: int = 64) -> MultiPackedGrid:
    """Pack co-located value-method grids DIRECTLY into one fused row
    table, slab by slab — the canonical-scale fusion path.

    ``combine_packed_grids`` needs every per-grid pack resident plus the
    fused output (2x the fused table in HBM); at the reference's
    canonical grid (13.2M cells, 3.4 GB per B-spline pack) that peak
    does not fit a 16 GB chip alongside anything else. Here each grid's
    slabs are written straight into the preallocated fused table with
    donated dynamic_update_slice, so the peak is the fused table plus
    ONE slab.

    ``lane_pad`` defaults to 64 (not 128): gathers are priced per
    128-lane tile, so a 3-grid B-spline row of 192 floats costs the
    same two tiles padded to 256 or not — padding past the next
    64-boundary only burns HBM.

    Hermite methods (tricubic / triquintic) fuse too: their f32
    Chebyshev packs contract ON DEVICE with the fused basis->Chebyshev
    axis matrices (see pack_grid), so each derivative slab flows
    straight into the fused table. At canonical scale this is the ONLY
    way to build a fused tricubic pair: combine_packed_grids needs
    both 3.4 GB singletons PLUS the 6.8 GB fused table resident
    (13.5 GB peak, measured RESOURCE_EXHAUSTED on a 16 GB v5e), while
    this path peaks at the fused table plus one slab."""
    first = grids[0]
    method = first.interp_method
    hermite = method in (InterpolationMethod.TRICUBIC,
                         InterpolationMethod.TRIQUINTIC)
    if not hermite and method not in (InterpolationMethod.TRILINEAR,
                                      InterpolationMethod.BSPLINE):
        raise ValueError(f"unsupported interpolation method {method}")
    if hermite and any(g.derivs is None for g in grids):
        raise ValueError("Hermite methods need precomputed derivatives")
    for g in grids[1:]:
        if (g.counts != first.counts or g.interp_method != method
                or g.oob_k != first.oob_k):
            raise ValueError(
                "grids must share counts/method/oob_k to fuse")
        if not (np.allclose(np.asarray(g.spacing),
                            np.asarray(first.spacing))
                and np.allclose(np.asarray(g.origin),
                                np.asarray(first.origin))):
            raise ValueError("grids must be co-located (same spacing and "
                            "origin) to fuse")
    dtype = dtype or first.vals.dtype
    nx, ny, nz = first.counts
    ncx, ncy, ncz = nx - 1, ny - 1, nz - 1
    ncells = ncx * ncy * ncz
    if method == InterpolationMethod.TRILINEAR:
        degree = 2
    elif method == InterpolationMethod.TRIQUINTIC:
        degree = 6
    else:
        degree = 4                      # B-spline / tricubic
    K = degree ** 3
    G = len(grids)
    width = G * K
    padded = -(-width // lane_pad) * lane_pad
    if x_chunk is None:
        x_chunk = ncx if ncells <= 2_000_000 else 64
    # same basis choice as pack_grid's default: Chebyshev for f32
    # Hermite packs (bounded coefficients on steep capped fields)
    poly_basis = ("chebyshev"
                  if hermite and jnp.dtype(dtype) == jnp.float32
                  else "monomial")
    if hermite:
        _hermite_axis_matrix(int(method))   # warm caches outside traces
        _hermite_axis_matrix_cheb(int(method))
    else:
        _value_axis_matrix(int(method))     # warm cache outside any trace

    out = jnp.zeros((ncells, padded), dtype)
    back_powers = []
    for gi, g in enumerate(grids):
        back_powers.append(
            g.inv_power
            if (g.inv_power_mode in (InvPowerMode.RUNTIME,
                                     InvPowerMode.STORED)
                and g.inv_power != 0.0) else 0.0)
        runtime_inv = (g.inv_power_mode == InvPowerMode.RUNTIME
                       and g.inv_power != 0.0)
        data = g.derivs if hermite else g.vals
        row = 0
        for c0 in range(0, ncx, x_chunk):
            c1 = min(c0 + x_chunk, ncx)
            n_slab = c1 - c0
            if hermite:
                # slab spans grid points [c0, c1]: the one-plane
                # stencil overlap Hermite cells need
                sl = jnp.asarray(data[c0:c1 + 1], dtype=dtype)
                part = _pack_derivs(
                    sl, method=int(method), runtime_inv=runtime_inv,
                    inv_power=g.inv_power,
                    counts=(n_slab + 1, ny, nz),
                    out_basis=poly_basis).astype(dtype)
            else:
                if method == InterpolationMethod.BSPLINE:
                    lo = max(c0 - 1, 0)
                    hi = min(c1 + 3, nx)
                    sl = jnp.asarray(data[lo:hi], dtype=dtype)
                    sl = jnp.pad(sl, ((lo - (c0 - 1), (c1 + 3) - hi),
                                      (1, 2), (1, 2)), mode="edge")
                else:
                    sl = jnp.asarray(data[c0:c1 + 1], dtype=dtype)
                part = _pack_values_padded(
                    sl, method=int(method), runtime_inv=runtime_inv,
                    inv_power=g.inv_power, ncells=(n_slab, ncy, ncz))
            out = _write_rows(out, part, row, gi * K)
            row += part.shape[0]

    return MultiPackedGrid(
        coeffs=out,
        spacing=jnp.asarray(first.spacing, dtype=dtype),
        origin=jnp.asarray(first.origin, dtype=dtype),
        counts=first.counts,
        degree=degree,
        n_grids=G,
        back_powers=tuple(back_powers),
        oob_k=first.oob_k,
        poly_basis=poly_basis,
    )


def evaluate_multi(multi: MultiPackedGrid, positions, scaling_factors):
    """Evaluate all fused grids with one gather per atom.

    Args:
      positions: [N, 3].
      scaling_factors: [G, N] per-grid per-atom scalings.

    Returns GridEval where per-atom energies/forces are summed over grids.
    Note: the out-of-bounds restraint is applied ONCE for the fused set —
    equivalent to the reference configuration of one restraint per
    GridForce only when restraints never engage (production boxes) or when
    the per-force restraint triple-counting is not wanted.
    """
    dtype = multi.coeffs.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)  # [G, N]

    pos = positions - multi.origin
    counts = jnp.asarray(multi.counts, dtype=dtype)
    corner = multi.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    icounts = jnp.asarray(multi.counts)
    t = pos / multi.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, icounts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)

    ncx, ncy, ncz = multi.cell_counts
    cell = (ixyz[..., 0] * ncy + ixyz[..., 1]) * ncz + ixyz[..., 2]
    d = multi.degree
    G = multi.n_grids
    K = d ** 3
    rows = jnp.take(multi.coeffs, cell, axis=0)[..., :G * K]
    rows = rows.reshape(rows.shape[:-1] + (G, K))     # [N, G, K]

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    pb = multi.poly_basis
    px, py, pz = (_poly_powers(fx, d, pb), _poly_powers(fy, d, pb),
                  _poly_powers(fz, d, pb))
    dpx, dpy, dpz = (_poly_dpowers(fx, d, pb), _poly_dpowers(fy, d, pb),
                     _poly_dpowers(fz, d, pb))
    R = rows.reshape(rows.shape[:-1] + (d, d, d))     # [N, G, d, d, d]
    interp = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, py, pz)
    gx = jnp.einsum("...gpqr,...p,...q,...r->...g", R, dpx, py, pz)
    gy = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, dpy, pz)
    gz = jnp.einsum("...gpqr,...p,...q,...r->...g", R, px, py, dpz)
    grad_s = jnp.stack([gx, gy, gz], axis=-1)         # [N, G, 3]

    if any(bp != 0.0 for bp in multi.back_powers):
        bps = jnp.asarray(multi.back_powers, dtype=dtype)
        enabled = jnp.asarray([bp != 0.0 for bp in multi.back_powers])
        sign = jnp.where(interp >= 0.0, 1.0, -1.0)
        a = jnp.abs(interp)
        act = (a > 1e-10) & enabled
        a_safe = jnp.where(act, a, 1.0)
        pf = jnp.where(act, bps * a_safe ** (bps - 1.0), 1.0)
        interp = jnp.where(act, sign * a_safe ** bps, interp)
        grad_s = grad_s * pf[..., None]

    grad_phys = grad_s / multi.spacing                # [N, G, 3]
    s_t = jnp.moveaxis(scaling, 0, -1)                # [N, G]
    active = inside[..., None] & (s_t != 0.0)         # [N, G]
    per_atom = jnp.sum(jnp.where(active, s_t * interp, 0.0), axis=-1)
    force_in = -jnp.sum(jnp.where(active[..., None],
                                  s_t[..., None] * grad_phys, 0.0), axis=-2)

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    oob = ~inside
    per_atom = per_atom + jnp.where(
        oob, 0.5 * multi.oob_k * jnp.sum(dev * dev, axis=-1), 0.0)
    forces = force_in + jnp.where(oob[..., None], -multi.oob_k * dev, 0.0)
    return GridEval(jnp.sum(per_atom), forces, per_atom)


# ----------------------------------------------------------------------
# Hermite-packed grids: one row gather per atom, BOUNDED basis.
#
# The monomial packed form above is ill-conditioned for triquintic in
# float32 (module docstring). Packing the 8 corners' derivative vectors
# per CELL instead keeps the single coalesced row gather (the thing TPU
# gathers are priced on) while evaluating in the Hermite basis, whose
# weights are bounded on [0,1] — float32 stays ~1e-7 relative even on
# steep capped receptor fields. This is the accuracy-tier fast path for
# tricubic/triquintic; degree <= 3 methods don't need it.
# ----------------------------------------------------------------------

from .derivatives27 import TRICUBIC_DERIV_MAP  # noqa: E402
from .interpolate import (_AX, _AX3, _AY, _AY3, _AZ, _AZ3,  # noqa: E402
                          _hermite_tensor_eval)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HermitePackedGrid:
    """Per-cell corner-derivative rows plus evaluation config."""

    coeffs: jax.Array            # [ncells, 8*D] (D = 8 or 27)
    spacing: jax.Array           # [3]
    origin: jax.Array            # [3]
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    method: int = dataclasses.field(
        default=int(InterpolationMethod.TRIQUINTIC),
        metadata=dict(static=True))
    back_power: float = dataclasses.field(default=0.0,
                                          metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


@partial(jax.jit, static_argnames=("method", "runtime_inv", "inv_power",
                                   "counts"))
def _pack_hermite_rows(derivs27, method, runtime_inv, inv_power, counts):
    nx, ny, nz = counts
    ncx, ncy, ncz = nx - 1, ny - 1, nz - 1
    D27 = derivs27
    if runtime_inv:
        D27 = apply_invpower(D27, 1.0 / inv_power)
    if method == InterpolationMethod.TRICUBIC:
        D = D27[..., list(TRICUBIC_DERIV_MAP)]     # [nx,ny,nz,8]
    else:
        D = D27                                     # [nx,ny,nz,27]
    corners = []
    from .interpolate import _CORNER_CX, _CORNER_CY, _CORNER_CZ
    for cx, cy, cz in zip(_CORNER_CX, _CORNER_CY, _CORNER_CZ):
        corners.append(D[cx:cx + ncx, cy:cy + ncy, cz:cz + ncz])
    X = jnp.stack(corners, axis=3)                  # [i,j,k,8,D]
    return X.reshape(ncx * ncy * ncz, -1)


def pack_grid_hermite(grid: Grid, dtype=None) -> HermitePackedGrid:
    """Pack a Hermite-method Grid into per-cell corner-derivative rows."""
    method = int(grid.interp_method)
    if method not in (int(InterpolationMethod.TRICUBIC),
                      int(InterpolationMethod.TRIQUINTIC)):
        raise ValueError("pack_grid_hermite is for tricubic/triquintic")
    if grid.derivs is None:
        raise ValueError("Hermite methods need precomputed derivatives")
    dtype = dtype or grid.vals.dtype
    back_power = 0.0
    if grid.inv_power_mode in (InvPowerMode.RUNTIME, InvPowerMode.STORED) \
            and grid.inv_power != 0.0:
        back_power = grid.inv_power
    runtime_inv = (grid.inv_power_mode == InvPowerMode.RUNTIME
                   and grid.inv_power != 0.0)
    coeffs = _pack_hermite_rows(jnp.asarray(grid.derivs, dtype=dtype),
                                method=method, runtime_inv=runtime_inv,
                                inv_power=grid.inv_power,
                                counts=grid.counts)
    return HermitePackedGrid(
        coeffs=coeffs,
        spacing=jnp.asarray(grid.spacing, dtype=dtype),
        origin=jnp.asarray(grid.origin, dtype=dtype),
        counts=grid.counts,
        method=method,
        back_power=back_power,
        oob_k=grid.oob_k,
    )


def evaluate_hermite_packed(hp: HermitePackedGrid, positions,
                            scaling_factors) -> GridEval:
    """Energy/forces via the Hermite-packed representation (same
    clamping/restraint/back-transform semantics as evaluate_packed)."""
    dtype = hp.coeffs.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)

    pos = positions - hp.origin
    counts = jnp.asarray(hp.counts, dtype=dtype)
    corner = hp.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    icounts = jnp.asarray(hp.counts)
    t = pos / hp.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, icounts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)

    ncx, ncy, ncz = hp.cell_counts
    cell = (ixyz[..., 0] * ncy + ixyz[..., 1]) * ncz + ixyz[..., 2]
    rows = jnp.take(hp.coeffs, cell, axis=0)       # [N, 8*D]
    X = rows.reshape(rows.shape[:-1] + (8, -1))    # [N, 8, D]

    if hp.method == int(InterpolationMethod.TRICUBIC):
        interp, grad_s = _hermite_tensor_eval(
            X, f, basis.hermite3_weights, basis.hermite3_derivs,
            _AX3, _AY3, _AZ3)
    else:
        interp, grad_s = _hermite_tensor_eval(
            X, f, basis.hermite5_weights, basis.hermite5_derivs,
            _AX, _AY, _AZ)

    if hp.back_power != 0.0:
        n = hp.back_power
        sign = jnp.where(interp >= 0.0, 1.0, -1.0)
        a = jnp.abs(interp)
        active_bp = a > 1e-10
        a_safe = jnp.where(active_bp, a, 1.0)
        pf = n * a_safe ** (n - 1.0)
        interp = jnp.where(active_bp, sign * a_safe ** n, interp)
        grad_s = jnp.where(active_bp[..., None], grad_s * pf[..., None],
                           grad_s)

    grad_phys = grad_s / hp.spacing
    energy_in = scaling * interp
    force_in = -scaling[..., None] * grad_phys

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    energy_oob = 0.5 * hp.oob_k * jnp.sum(dev * dev, axis=-1)
    force_oob = -hp.oob_k * dev

    active = inside & (scaling != 0.0)
    per_atom = jnp.where(active, energy_in, energy_oob)
    forces = jnp.where(active[..., None], force_in, force_oob)
    return GridEval(jnp.sum(per_atom), forces, per_atom)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiHermitePackedGrid:
    """G Hermite-packed grids fused into one row table [ncells,
    pad(G*8*D)]: one gather per atom serves every co-located grid in the
    accuracy-tier (bounded-basis) representation."""

    coeffs: jax.Array
    spacing: jax.Array
    origin: jax.Array
    counts: tuple = dataclasses.field(default=(0, 0, 0),
                                      metadata=dict(static=True))
    method: int = dataclasses.field(
        default=int(InterpolationMethod.TRIQUINTIC),
        metadata=dict(static=True))
    n_grids: int = dataclasses.field(default=1, metadata=dict(static=True))
    back_powers: tuple = dataclasses.field(default=(),
                                           metadata=dict(static=True))
    oob_k: float = dataclasses.field(default=0.0,
                                     metadata=dict(static=True))

    @property
    def num_grids(self) -> int:
        return self.n_grids

    @property
    def cell_counts(self):
        nx, ny, nz = self.counts
        return (nx - 1, ny - 1, nz - 1)


def combine_hermite_packed(hps, lane_pad: int = 128
                           ) -> MultiHermitePackedGrid:
    """Fuse HermitePackedGrids with identical geometry/method."""
    first = hps[0]
    for p in hps[1:]:
        if (p.counts != first.counts or p.method != first.method
                or p.oob_k != first.oob_k):
            raise ValueError("grids must share counts/method/oob_k to fuse")
        if not (np.allclose(np.asarray(p.spacing),
                            np.asarray(first.spacing))
                and np.allclose(np.asarray(p.origin),
                                np.asarray(first.origin))):
            raise ValueError("grids must be co-located (same spacing and "
                            "origin) to fuse")

    G = len(hps)
    K = first.coeffs.shape[-1]
    width = G * K
    padded = -(-width // lane_pad) * lane_pad

    # lane-axis concatenates of multi-GB tables crash the TPU compiler
    # (see combine_packed_grids); assemble with dynamic_update_slice
    flat = _fuse_lanes(tuple(p.coeffs for p in hps), padded)
    return MultiHermitePackedGrid(
        coeffs=flat, spacing=first.spacing, origin=first.origin,
        counts=first.counts, method=first.method, n_grids=G,
        back_powers=tuple(p.back_power for p in hps), oob_k=first.oob_k)


def evaluate_hermite_multi(multi: MultiHermitePackedGrid, positions,
                           scaling_factors) -> GridEval:
    """All fused Hermite-packed grids with one gather per atom.

    ``scaling_factors``: [G, N]. The OOB restraint applies once per fused
    set (same convention as evaluate_multi)."""
    dtype = multi.coeffs.dtype
    positions = jnp.asarray(positions, dtype=dtype)
    scaling = jnp.asarray(scaling_factors, dtype=dtype)  # [G, N]

    pos = positions - multi.origin
    counts = jnp.asarray(multi.counts, dtype=dtype)
    corner = multi.spacing * (counts - 1.0)
    inside = jnp.all((pos >= 0.0) & (pos <= corner), axis=-1)

    icounts = jnp.asarray(multi.counts)
    t = pos / multi.spacing
    ixyz = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, icounts - 2)
    f = jnp.clip(t - ixyz, 0.0, 1.0)

    ncx, ncy, ncz = multi.cell_counts
    cell = (ixyz[..., 0] * ncy + ixyz[..., 1]) * ncz + ixyz[..., 2]
    G = multi.n_grids
    D = (8 if multi.method == int(InterpolationMethod.TRICUBIC) else 27)
    K = 8 * D
    rows = jnp.take(multi.coeffs, cell, axis=0)[..., :G * K]
    X = rows.reshape(rows.shape[:-1] + (G, 8, D))      # [N, G, 8, D]

    if multi.method == int(InterpolationMethod.TRICUBIC):
        fams = (basis.hermite3_weights, basis.hermite3_derivs,
                _AX3, _AY3, _AZ3)
    else:
        fams = (basis.hermite5_weights, basis.hermite5_derivs,
                _AX, _AY, _AZ)

    def one_grid(Xg):                                   # [N, 8, D]
        return _hermite_tensor_eval(Xg, f, *fams)

    interp, grad_s = jax.vmap(one_grid, in_axes=-3,
                              out_axes=(-1, -2))(X)
    # interp [N, G]; grad_s [N, G, 3]

    if any(bp != 0.0 for bp in multi.back_powers):
        bps = jnp.asarray(multi.back_powers, dtype=dtype)
        enabled = jnp.asarray([bp != 0.0 for bp in multi.back_powers])
        sign = jnp.where(interp >= 0.0, 1.0, -1.0)
        a = jnp.abs(interp)
        act = (a > 1e-10) & enabled
        a_safe = jnp.where(act, a, 1.0)
        pf = jnp.where(act, bps * a_safe ** (bps - 1.0), 1.0)
        interp = jnp.where(act, sign * a_safe ** bps, interp)
        grad_s = grad_s * pf[..., None]

    grad_phys = grad_s / multi.spacing
    s_t = jnp.moveaxis(scaling, 0, -1)                  # [N, G]
    active = inside[..., None] & (s_t != 0.0)
    per_atom = jnp.sum(jnp.where(active, s_t * interp, 0.0), axis=-1)
    force_in = -jnp.sum(jnp.where(active[..., None],
                                  s_t[..., None] * grad_phys, 0.0),
                        axis=-2)

    dev = jnp.where(pos < 0.0, pos,
                    jnp.where(pos > corner, pos - corner, 0.0))
    oob = ~inside
    per_atom = per_atom + jnp.where(
        oob, 0.5 * multi.oob_k * jnp.sum(dev * dev, axis=-1), 0.0)
    forces = force_in + jnp.where(oob[..., None], -multi.oob_k * dev, 0.0)
    return GridEval(jnp.sum(per_atom), forces, per_atom)
